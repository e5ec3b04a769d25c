package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** From-scratch single-table SQLite database writer — the S7 sink
  * (reference: de/formats.py:187-202 writes the table into one `.sqlite`
  * file as table "table" via pandas to_sql). No sqlite-jdbc exists in the
  * offline environment, so this implements the PUBLIC SQLite file format
  * (sqlite.org/fileformat2.html): database header, table b-tree leaf /
  * interior pages, overflow-page chains, and the record serial-type
  * encoding. FormatsSpec round-trips the output through the container's
  * real sqlite3 (via python3) — the file is read by the reference
  * implementation itself, which is a stronger check than any re-written
  * reader.
  *
  * Driver-side by design, like the reference's pandas path: this sink is
  * for RESULT tables (estimates, reports, grids), not data-scale corpora —
  * callers stream big data to parquet instead. Rows are collected to the
  * driver; the loud `maxRows` guard keeps an accidental corpus write from
  * OOMing the driver silently.
  */
object SqliteWriter {

  private val PageSize = 4096
  private val Usable = PageSize // reserved-space-per-page = 0
  private val MaxLeafLocal = Usable - 35 // 4061
  private val MinLeafLocal = (Usable - 12) * 32 / 255 - 23 // 489

  /** Write `df` as table `tableName` at `path` (overwrites). */
  def write(
      df: DataFrame,
      path: Path,
      tableName: String = "table",
      maxRows: Int = 1000000): Unit = {
    val schema = df.schema
    // take(maxRows+1), not collect(): the driver materializes at most
    // maxRows+1 rows in ONE job, so an accidentally corpus-scale frame
    // fails loudly here instead of OOMing the driver inside a collect()
    // the guard would only inspect afterwards
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"SqliteWriter: more than maxRows=$maxRows rows — this is " +
        "a driver-side RESULT-table sink; write corpora to parquet")
    val records = rows.map(encodeRecord(schema, _))

    // page 0 of this buffer is page 1 of the file (reserved for the schema)
    val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    pages += null // placeholder for page 1

    def appendPage(p: Array[Byte]): Int = { pages += p; pages.length }

    // ---- data b-tree: leaves (with overflow chains), then interior levels
    // (child page, largest rowid in child) per level, built bottom-up
    var level: Seq[(Int, Long)] = buildLeaves(records, appendPage)
    while (level.length > 1) level = buildInterior(level, appendPage)
    val rootPage = level.head._1

    // ---- page 1: sqlite_master leaf with the single table row.
    // Identifiers are double-quoted with embedded quotes DOUBLED — an
    // unescaped quote would write a schema row sqlite later rejects as
    // malformed, far from the cause
    def ident(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""
    val createSql = s"CREATE TABLE ${ident(tableName)}(" +
      schema.fields.map(f => s"${ident(f.name)} ${affinity(f.dataType)}")
        .mkString(", ") + ")"
    val masterRecord = encodeValues(Seq(
      SqlText("table"), SqlText(tableName), SqlText(tableName),
      SqlInt(rootPage.toLong), SqlText(createSql)))
    // page 1's usable payload is smaller than a plain leaf's: 100-byte db
    // header + 8-byte leaf header + one 2-byte cell pointer — checking
    // MaxLeafLocal alone would let a huge CREATE TABLE silently overwrite
    // the page-1 headers
    require(masterRecord.length + 13 <= PageSize - 100 - 8 - 2,
      s"CREATE TABLE row too large for page 1 (${masterRecord.length} bytes; " +
        "shorten column names or reduce column count)")
    val masterCell = {
      val out = new java.io.ByteArrayOutputStream()
      writeVarint(out, masterRecord.length.toLong)
      writeVarint(out, 1L)
      out.write(masterRecord)
      out.toByteArray
    }
    val master = new Array[Byte](PageSize)
    writeHeader(master, pages.length)
    writeLeafInto(master, 100, Seq((1L, masterCell, masterCell.length)))
    pages(0) = master

    Files.createDirectories(path.toAbsolutePath.getParent)
    val out = Files.newOutputStream(path)
    try pages.foreach(out.write)
    finally out.close()
  }

  // ------------------------------------------------------------- encoding

  private sealed trait SqlVal
  private case object SqlNull extends SqlVal
  private final case class SqlInt(v: Long) extends SqlVal
  private final case class SqlReal(v: Double) extends SqlVal
  private final case class SqlText(v: String) extends SqlVal
  private final case class SqlBlob(v: Array[Byte]) extends SqlVal

  private def affinity(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case _: DecimalType | DateType | TimestampType | TimestampNTZType => "TEXT"
    // sqlite has no nested types: arrays/structs/maps store as JSON TEXT
    // (readable by sqlite's own json functions)
    case _: ArrayType | _: StructType | _: MapType => "TEXT"
    case other =>
      throw new IllegalArgumentException(s"SqliteWriter: unsupported type $other")
  }

  /** Deterministic JSON rendering for nested columns: map keys sorted,
    * numbers via toString, binary as uppercase hex — no engine-dependent
    * formatting anywhere, so a re-written file is byte-identical.
    */
  private def jsonText(dt: DataType, v: Any): String = {
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def go(dt: DataType, v: Any): String =
      if (v == null) "null"
      else dt match {
        case ArrayType(et, _) =>
          v.asInstanceOf[scala.collection.Seq[Any]].map(go(et, _))
            .mkString("[", ",", "]")
        case st: StructType =>
          val r = v.asInstanceOf[Row]
          st.fields.zipWithIndex
            .map { case (f, i) => esc(f.name) + ":" + go(f.dataType, r.get(i)) }
            .mkString("{", ",", "}")
        case MapType(_, vt, _) =>
          v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
            .map { case (k, x) => (String.valueOf(k), go(vt, x)) }
            .sortBy(_._1)
            .map { case (k, x) => esc(k) + ":" + x }
            .mkString("{", ",", "}")
        case StringType => esc(v.asInstanceOf[String])
        // non-finite floats have no JSON literal (Java renders NaN/Infinity,
        // which sqlite's json functions reject as malformed) → JSON null
        case FloatType =>
          val f = v.asInstanceOf[Float]
          if (java.lang.Float.isFinite(f)) f.toString else "null"
        case DoubleType =>
          val d = v.asInstanceOf[Double]
          if (java.lang.Double.isFinite(d)) d.toString else "null"
        case BooleanType | ByteType | ShortType | IntegerType | LongType =>
          v.toString
        case TimestampType =>
          esc(v.asInstanceOf[java.sql.Timestamp].toInstant.toString)
        case TimestampNTZType =>
          esc(v.asInstanceOf[java.time.LocalDateTime].toString)
        case DateType | _: DecimalType => esc(v.toString)
        case BinaryType =>
          esc(v.asInstanceOf[Array[Byte]].map(b => f"$b%02X").mkString)
        case other =>
          throw new IllegalArgumentException(
            s"SqliteWriter: unsupported nested type $other")
      }
    go(dt, v)
  }

  private def toVal(dt: DataType, v: Any): SqlVal =
    if (v == null) SqlNull
    else dt match {
      case ByteType => SqlInt(v.asInstanceOf[Byte].toLong)
      case ShortType => SqlInt(v.asInstanceOf[Short].toLong)
      case IntegerType => SqlInt(v.asInstanceOf[Int].toLong)
      case LongType => SqlInt(v.asInstanceOf[Long])
      case BooleanType => SqlInt(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case FloatType => SqlReal(v.asInstanceOf[Float].toDouble)
      case DoubleType => SqlReal(v.asInstanceOf[Double])
      case StringType => SqlText(v.asInstanceOf[String])
      case BinaryType => SqlBlob(v.asInstanceOf[Array[Byte]])
      // lexical forms for the text-affinity fallbacks (like to_sql's
      // stringification). Timestamps render via Instant (ISO-8601 UTC):
      // java.sql.Timestamp.toString uses the JVM default timezone, which
      // would make the file content machine-dependent
      case TimestampType =>
        SqlText(v.asInstanceOf[java.sql.Timestamp].toInstant.toString)
      // NTZ is zone-less by definition: LocalDateTime.toString is ISO-8601
      // with no zone math anywhere, so the file content is deterministic
      // (Spark 4 surfaces parquet TIMESTAMP(isAdjustedToUTC=false) as NTZ)
      case TimestampNTZType =>
        SqlText(v.asInstanceOf[java.time.LocalDateTime].toString)
      case _: DecimalType | DateType => SqlText(v.toString)
      case nested @ (_: ArrayType | _: StructType | _: MapType) =>
        SqlText(jsonText(nested, v))
      case other =>
        throw new IllegalArgumentException(s"SqliteWriter: unsupported type $other")
    }

  private def encodeRecord(schema: StructType, row: Row): Array[Byte] =
    encodeValues(schema.fields.zipWithIndex.map { case (f, i) =>
      toVal(f.dataType, row.get(i))
    }.toSeq)

  /** SQLite record format: header(varint size, serial types) + body. */
  private def encodeValues(vals: Seq[SqlVal]): Array[Byte] = {
    val serials = vals.map {
      case SqlNull => 0L
      case SqlInt(0L) => 8L // schema format 4 constants
      case SqlInt(1L) => 9L
      case SqlInt(v) => intSerial(v)
      case SqlReal(_) => 7L
      case SqlText(s) => 13L + 2L * s.getBytes("UTF-8").length
      case SqlBlob(b) => 12L + 2L * b.length
    }
    val typesBytes = serials.flatMap(varint).toArray
    // header size varint includes itself; sizes here are < 2^14, so the
    // fixpoint stabilizes in two steps
    var headerLen = typesBytes.length + 1
    if (headerLen + varintLen(headerLen.toLong) - 1 > 127) headerLen = typesBytes.length + 2
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, headerLen.toLong)
    out.write(typesBytes)
    vals.foreach {
      case SqlNull | SqlInt(0L) | SqlInt(1L) => ()
      case SqlInt(v) => out.write(intBytes(v))
      case SqlReal(d) =>
        out.write(java.nio.ByteBuffer.allocate(8).putDouble(d).array())
      case SqlText(s) => out.write(s.getBytes("UTF-8"))
      case SqlBlob(b) => out.write(b)
    }
    out.toByteArray
  }

  /** Smallest big-endian signed-int serial type holding v (excluding the
    * 0/1 constants, handled by the caller).
    */
  private def intSerial(v: Long): Long =
    if (v >= -128 && v <= 127) 1L
    else if (v >= -32768 && v <= 32767) 2L
    else if (v >= -8388608 && v <= 8388607) 3L
    else if (v >= Int.MinValue && v <= Int.MaxValue) 4L
    else if (v >= -140737488355328L && v <= 140737488355327L) 5L
    else 6L

  private def intBytes(v: Long): Array[Byte] = {
    val n = intSerial(v) match {
      case 1L => 1; case 2L => 2; case 3L => 3; case 4L => 4; case 5L => 6; case _ => 8
    }
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def varintLen(v: Long): Int = varint(v).length

  /** Encode once, write once — the write-sites pattern (varint(x) twice per
    * value) would double the allocations on the single-threaded encode path.
    */
  private def writeVarint(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    val b = varint(v)
    out.write(b, 0, b.length)
  }

  private def varint(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 56),
      s"varint out of the supported positive range: $v")
    if (v < 0x80) Array(v.toByte)
    else {
      val groups = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x != 0) { groups += (x & 0x7f).toByte; x >>>= 7 }
      val arr = groups.reverse.toArray
      (0 until arr.length - 1).foreach(i => arr(i) = (arr(i) | 0x80).toByte)
      arr
    }
  }

  // ---------------------------------------------------------------- pages

  /** Pack records into leaf pages (allocating overflow chains as needed);
    * returns (leafPageNumber, maxRowidInLeaf) in key order.
    */
  private def buildLeaves(
      records: Seq[Array[Byte]],
      appendPage: Array[Byte] => Int): Seq[(Int, Long)] = {
    // (rowid, localPayload ++ overflowPointer, totalPayloadLen)
    final case class Cell(rowid: Long, bytes: Array[Byte], payloadLen: Int)

    def makeCell(rowid: Long, payload: Array[Byte]): Cell =
      if (payload.length <= MaxLeafLocal) Cell(rowid, payload, payload.length)
      else {
        // spill: K local bytes, remainder in a chain of overflow pages
        val p = payload.length
        val k0 = MinLeafLocal + (p - MinLeafLocal) % (Usable - 4)
        val local = if (k0 <= MaxLeafLocal) k0 else MinLeafLocal
        val chunks = payload.drop(local).grouped(Usable - 4).toSeq
        // allocate the chain back-to-front so each page knows its successor
        val firstPage = chunks.reverse
          .foldLeft(0) { (nextPage, chunk) =>
            val page = new Array[Byte](PageSize)
            writeInt4(page, 0, nextPage)
            System.arraycopy(chunk, 0, page, 4, chunk.length)
            appendPage(page)
          }
        val buf = java.nio.ByteBuffer.allocate(local + 4)
        buf.put(payload, 0, local)
        buf.putInt(firstPage)
        Cell(rowid, buf.array(), p)
      }

    def cellBytes(c: Cell): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writeVarint(out, c.payloadLen.toLong)
      writeVarint(out, c.rowid)
      out.write(c.bytes)
      out.toByteArray
    }

    val leaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte], Int)]
    var used = 0
    def flush(): Unit = if (pending.nonEmpty || leaves.isEmpty) {
      val page = new Array[Byte](PageSize)
      writeLeafInto(page, 0, pending.toSeq)
      val n = appendPage(page)
      leaves += ((n, if (pending.isEmpty) 0L else pending.last._1))
      pending = scala.collection.mutable.ArrayBuffer.empty
      used = 0
    }
    records.zipWithIndex.foreach { case (rec, i) =>
      val cell = makeCell(i + 1L, rec)
      val cb = cellBytes(cell)
      if (pending.nonEmpty && 8 + used + 2 + cb.length > PageSize) flush()
      require(8 + 2 + cb.length <= PageSize,
        s"cell larger than a page after overflow split (${cb.length} bytes)")
      pending += ((cell.rowid, cb, cb.length))
      used += 2 + cb.length
    }
    flush() // also emits the single empty leaf for a zero-row table
    leaves.toSeq
  }

  /** One interior level over `children` (page, maxRowid): last child is the
    * right-most pointer, the rest become (child, maxRowid) cells.
    */
  private def buildInterior(
      children: Seq[(Int, Long)],
      appendPage: Array[Byte] => Int): Seq[(Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    // interior fan-out: cell = 4B child + <=9B key + 2B pointer => hundreds
    // per page; cap conservatively and pack whole groups
    val maxCells = (PageSize - 12) / (4 + 9 + 2)
    // avoid a degenerate trailing group of ONE child (it would produce a
    // 0-cell interior page): move one child from the preceding full group
    val groups0 = children.grouped(maxCells + 1).toSeq
    val groups =
      if (groups0.length > 1 && groups0.last.length == 1)
        groups0.dropRight(2) :+ groups0(groups0.length - 2).init :+
          (groups0(groups0.length - 2).takeRight(1) ++ groups0.last)
      else groups0
    groups.foreach { group =>
      val cells = group.init.map { case (child, maxRow) =>
        val key = varint(maxRow)
        val b = java.nio.ByteBuffer.allocate(4 + key.length)
        b.putInt(child).put(key)
        b.array()
      }
      val page = new Array[Byte](PageSize)
      page(0) = 0x05
      writeInt2(page, 3, cells.length)
      writeInt4(page, 8, group.last._1) // right-most child
      var content = PageSize
      cells.zipWithIndex.foreach { case (cb, i) =>
        content -= cb.length
        System.arraycopy(cb, 0, page, content, cb.length)
        writeInt2(page, 12 + 2 * i, content)
      }
      writeInt2(page, 5, content)
      out += ((appendPage(page), group.last._2))
    }
    out.toSeq
  }

  /** Leaf b-tree header + cells into `page` at `off` (100 on page 1). */
  private def writeLeafInto(
      page: Array[Byte], off: Int, cells: Seq[(Long, Array[Byte], Int)]): Unit = {
    page(off) = 0x0d
    writeInt2(page, off + 3, cells.length)
    var content = PageSize
    cells.zipWithIndex.foreach { case ((_, cb, _), i) =>
      content -= cb.length
      System.arraycopy(cb, 0, page, content, cb.length)
      writeInt2(page, off + 8 + 2 * i, content)
    }
    writeInt2(page, off + 5, if (content == 65536) 0 else content)
  }

  /** The 100-byte database header (into page 1). */
  private def writeHeader(page: Array[Byte], nPages: Int): Unit = {
    val magic = "SQLite format 3".getBytes("ISO-8859-1") // 15 bytes + NUL
    System.arraycopy(magic, 0, page, 0, 15)
    page(15) = 0
    writeInt2(page, 16, PageSize)
    page(18) = 1 // legacy write version
    page(19) = 1 // legacy read version
    page(20) = 0 // reserved space
    page(21) = 64; page(22) = 32; page(23) = 32 // payload fractions
    writeInt4(page, 24, 1) // file change counter
    writeInt4(page, 28, nPages)
    writeInt4(page, 40, 1) // schema cookie
    writeInt4(page, 44, 4) // schema format (4: allows 0/1 serial constants)
    writeInt4(page, 56, 1) // text encoding: UTF-8
    writeInt4(page, 92, 1) // version-valid-for = change counter
    writeInt4(page, 96, 3040001) // sqlite version stamp
  }

  private def writeInt2(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >> 8) & 0xff).toByte
    a(off + 1) = (v & 0xff).toByte
  }

  private def writeInt4(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >> 24) & 0xff).toByte
    a(off + 1) = ((v >> 16) & 0xff).toByte
    a(off + 2) = ((v >> 8) & 0xff).toByte
    a(off + 3) = (v & 0xff).toByte
  }
}
