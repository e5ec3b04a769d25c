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

  def apply(bytes: Array[Byte]): Int = {
    if (bytes.isEmpty) 0
    else {
      val max = compressor.maxCompressedLength(bytes.length)
      val dst = new Array[Byte](max)
      compressor.compress(bytes, 0, bytes.length, dst, 0, max)
    }
  }
}
