package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's box-drift normalization inputs
  * ([[Bench.kernelRatiosVsPrev]] / [[Bench.medianOr]]): the codec-kernel
  * ratio is the round-over-round "box, not plans" probe, so extracting a
  * previous RATIO instead of a previous TIME (the round-18 review catch:
  * new-format artifacts repeat every kernel name inside their own
  * codec_kernel_ratios block, BEFORE the times) would silently publish a
  * fake ~2× regression — exactly the failure the field exists to rule
  * out.
  */
class BenchNormalizationSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  // a round-18+ style artifact: kernel names appear FIRST as ratios,
  // then as shared-build times, then as query times
  private val newFormat =
    s"""{"metric":"total","value":100.0,"unit":"sec","load_index":1.2,""" +
      s""""sentinel_floor":0.200,"normalized_total":75.5,""" +
      s""""codec_kernel_ratio_vs_prev":1.141,""" +
      s""""codec_kernel_ratios":{"mm_audio_fp":1.141,"mm_video_fp":0.923,"mm_phash_dedup":0.520,"phash_pairs":0.673,"video_pairs":0.852},""" +
      s""""shared_builds":{"phash_pairs":4.000,"video_pairs":2.000},""" +
      s""""queries":{"mm_audio_fp":2.000,"mm_video_fp":1.000,"mm_phash_dedup":0.500},"sf":"$sf"}"""
  // a pre-r18 artifact: no ratios block at all
  private val oldFormat =
    s"""{"metric":"total","value":100.0,"unit":"sec",""" +
      s""""shared_builds":{"phash_pairs":4.0,"video_pairs":2.0},""" +
      s""""queries":{"mm_audio_fp":2.0,"mm_video_fp":1.0,"mm_phash_dedup":0.5},"sf":"$sf"}"""

  private val current = Map(
    "mm_audio_fp" -> 3.0, "mm_video_fp" -> 1.5, "mm_phash_dedup" -> 1.0,
    "phash_pairs" -> 4.0, "video_pairs" -> 3.0)

  test("ratios divide by previous TIMES even when a ratios block precedes them") {
    val r = Bench.kernelRatiosVsPrev(newFormat, sf, current).toMap
    // 3.0/2.000, NOT 3.0/1.141 (the ratio the old whole-text match read)
    assert(r("mm_audio_fp") === 1.5)
    assert(r("mm_video_fp") === 1.5)
    assert(r("mm_phash_dedup") === 2.0)
    assert(r("phash_pairs") === 1.0) // from shared_builds
    assert(r("video_pairs") === 1.5)
  }

  test("old-format artifacts extract identically") {
    val r = Bench.kernelRatiosVsPrev(oldFormat, sf, current).toMap
    assert(r === Map("mm_audio_fp" -> 1.5, "mm_video_fp" -> 1.5,
      "mm_phash_dedup" -> 2.0, "phash_pairs" -> 1.0, "video_pairs" -> 1.5))
  }

  test("cross-SF artifacts yield no ratios (the sf0.01-vs-sf0.1 junk guard)") {
    assert(Bench.kernelRatiosVsPrev(newFormat, "/root/testdata/sf0.01",
      current).isEmpty)
  }

  test("artifacts without a shared_builds section yield no ratios") {
    assert(Bench.kernelRatiosVsPrev(
      s"""{"value":1.0,"sf":"$sf"}""", sf, current).isEmpty)
  }

  test("kernels missing on either side are skipped, not zeroed") {
    val partial = Bench.kernelRatiosVsPrev(newFormat, sf,
      Map("mm_audio_fp" -> 3.0)).toMap
    assert(partial === Map("mm_audio_fp" -> 1.5))
    // a -1 failure marker on the current side is excluded too
    val failed = Bench.kernelRatiosVsPrev(newFormat, sf,
      Map("mm_audio_fp" -> -1.0, "mm_video_fp" -> 1.5)).toMap
    assert(failed === Map("mm_video_fp" -> 1.5))
  }

  test("prevStreamFloor: present, absent, cross-SF, and failed-marker cases") {
    // an r19+ artifact carries the streaming I/O-floor probe
    val withFloor =
      s"""{"metric":"total","sentinel_floor":0.200,""" +
        s""""stream_sentinel_floor":0.450,"stream_floor_secs":[0.450,0.470],""" +
        s""""queries":{},"sf":"$sf"}"""
    assert(Bench.prevStreamFloor(withFloor, sf) === 0.450)
    // pre-r19 artifacts (the committed r18 headline's format) have no
    // field: -1 = unavailable, never a fake ratio
    assert(Bench.prevStreamFloor(newFormat, sf) === -1.0)
    // cross-SF floors are junk for the same reason kernel ratios are
    assert(Bench.prevStreamFloor(withFloor, "/root/testdata/sf0.01") === -1.0)
    // a previous run whose every probe failed published -1; that must
    // not propagate as a "previous floor"
    val failed = withFloor.replace("\"stream_sentinel_floor\":0.450",
      "\"stream_sentinel_floor\":-1.000")
    assert(Bench.prevStreamFloor(failed, sf) === -1.0)
  }

  test("medianOr: odd, even, and the empty -1 marker") {
    assert(Bench.medianOr(Seq(3.0, 1.0, 2.0), -1.0) === 2.0)
    assert(Bench.medianOr(Seq(1.0, 2.0, 3.0, 4.0), -1.0) === 2.5)
    assert(Bench.medianOr(Seq.empty, -1.0) === -1.0)
  }

  test("the COMMITTED artifact round-trips through the extractor") {
    // the real headline at HEAD: extracting it against itself must give
    // ratio 1.0 for every kernel present — a format drift that breaks
    // the regex shows up here before it ships garbage next round
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_full.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val sfInArtifact =
      "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).get.group(1)
    // current = the artifact's own times for the kernels
    val timesTail = txt.substring(txt.indexOf("\"shared_builds\":"))
    val own = Bench.CodecKernels.flatMap { k =>
      ("\"" + k + "\":(-?[0-9][0-9.eE+-]*)").r.findFirstMatchIn(timesTail)
        .map(m => k -> m.group(1).toDouble)
    }.toMap
    assert(own.nonEmpty, "committed artifact lists no codec kernels")
    val r = Bench.kernelRatiosVsPrev(txt, sfInArtifact, own)
    assert(r.nonEmpty)
    r.foreach { case (k, v) =>
      assert(math.abs(v - 1.0) < 1e-9, s"$k self-ratio $v != 1.0")
    }
  }
}
