package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Kernel micro-benchmarks (tagged informational — assert loose floors so
  * regressions surface, print actual numbers for tuning). The chunker scan
  * is the 100 TB-critical path: everything else is Spark built-ins.
  */
class ThroughputBench extends AnyFunSuite {

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  test("chunker scan throughput") {
    val data = randomBytes(256 << 20, 1L) // 256 MiB
    // warm-up
    Chunker.boundaries(java.util.Arrays.copyOf(data, 16 << 20))
    val t0 = System.nanoTime()
    val bounds = Chunker.boundaries(data)
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = (data.length / (1 << 20)) / secs
    info(f"boundaries: $mbps%.0f MiB/s (${bounds.size} chunks)")
    // loose floor: suite runs share the box with Spark executors; isolated
    // runs measure 450-620 MiB/s with the hash-free window warm-up skip
    assert(mbps > 40, f"chunker too slow: $mbps%.0f MiB/s")
  }

  test("streaming iterator throughput incl. hash + lz4") {
    val data = randomBytes(128 << 20, 2L)
    val t0 = System.nanoTime()
    var n = 0L
    val it = new ChunkIterator(new java.io.ByteArrayInputStream(data), ChunkerParams.Default)
    while (it.hasNext) {
      val c = it.next()
      n += XXH64.hash(c, 42L) & 1L
      n += Lz4Len(c) & 1L
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = (data.length / (1 << 20)) / secs
    info(f"chunk+hash+lz4: $mbps%.0f MiB/s")
    // loose floor (see above); isolated runs measure 225-345 MiB/s
    assert(mbps > 20, f"pipeline too slow: $mbps%.0f MiB/s")
  }
}
