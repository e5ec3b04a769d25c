package graft.cdc

/** Pure-Scala xxHash64 (public algorithm, https://xxhash.com spec).
  *
  * Chunk identity hash for the CDC estimator. The reference uses xxh3-64
  * (reference: src/store.rs:44); we use classic xxHash64 with seed 42 so
  * values are bit-identical to Spark SQL's built-in `xxhash64(...)`
  * expression — that keeps chunk identity reproducible from SQL and lets
  * the DuckDB oracle re-derive it where needed. Equality-class semantics
  * (what dedup actually needs) are unchanged; see SURVEY.md §1.3-1.
  */
object XXH64 {
  final val DefaultSeed = 42L // Spark's xxhash64 default seed

  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  @inline private def round(acc: Long, in: Long): Long = rotl(acc + in * P2, 31) * P1
  @inline private def mergeRound(h: Long, v: Long): Long = (h ^ round(0L, v)) * P1 + P4

  @inline private def readLE64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readLE32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  def hash(data: Array[Byte], seed: Long): Long = hash(data, 0, data.length, seed)

  def hash(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var idx = off
    val end = off + len
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (idx <= limit) {
        v1 = round(v1, readLE64(data, idx))
        v2 = round(v2, readLE64(data, idx + 8))
        v3 = round(v3, readLE64(data, idx + 16))
        v4 = round(v4, readLE64(data, idx + 24))
        idx += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (idx + 8 <= end) {
      h ^= round(0L, readLE64(data, idx))
      h = rotl(h, 27) * P1 + P4
      idx += 8
    }
    if (idx + 4 <= end) {
      h ^= readLE32(data, idx) * P1
      h = rotl(h, 23) * P2 + P3
      idx += 4
    }
    while (idx < end) {
      h ^= (data(idx) & 0xffL) * P5
      h = rotl(h, 11) * P1
      idx += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }
}
