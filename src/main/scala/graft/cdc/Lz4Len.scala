package graft.cdc

import net.jpountz.lz4.LZ4Factory

/** Per-chunk LZ4-compressed size: measures compressibility, discards the
  * compressed bytes (reference: src/store.rs:45 uses lz4_flex block
  * compress). lz4-java ships inside the Spark distribution, so this is a
  * zero-extra-dependency kernel function. LZ4Compressor instances are
  * stateless and thread-safe; one shared fast compressor serves all tasks.
  */
object Lz4Len {
  private lazy val compressor = LZ4Factory.fastestInstance().fastCompressor()

  // reusable per-thread destination buffer: small-chunk workloads (in-table
  // payloads at low maskBits produce ~32 B chunks) would otherwise pay one
  // allocation per chunk just to measure and discard the compressed bytes
  private val dstTL = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def apply(bytes: Array[Byte]): Int = apply(bytes, 0, bytes.length)

  /** Compressed length of `bytes[off, off+len)` — no source copy. */
  def apply(bytes: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) 0
    else {
      val max = compressor.maxCompressedLength(len)
      var dst = dstTL.get()
      if (dst.length < max) { dst = new Array[Byte](max); dstTL.set(dst) }
      compressor.compress(bytes, off, len, dst, 0, max)
    }
  }
}
