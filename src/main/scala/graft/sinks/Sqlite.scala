package graft.sinks

import java.io.RandomAccessFile

/** Minimal single-writer SQLite 3 database file writer — just enough
  * of the public file format (sqlite.org/fileformat2.html) to emit a
  * valid `.mbtiles` container WITHOUT a JDBC driver (none is
  * resolvable offline; this closes the one deviation SURVEY §1.4 has
  * carried since r7). Write-only and bottom-up: leaves stream to disk
  * as they fill, interiors build over their page numbers, page 1's
  * header + `sqlite_master` are back-patched last. No freelist, no
  * WAL, no pointer-map pages (auto-vacuum off), UTF-8 text encoding.
  *
  * Supported surface: table b-trees (rowid tables, arbitrarily large
  * cell payloads via overflow chains) and UNIQUE index b-trees over
  * pre-sorted entries (divider entries promoted to interiors exactly
  * once, as the format requires — an index entry exists at ONE level
  * of the tree). That is precisely the MBTiles schema: two rowid
  * tables + one unique index.
  *
  * The lock-byte page (the 4096-byte page covering file offset 2^30,
  * page 262145 at this page size) is skipped with a zero page when
  * the database grows past 1 GiB, as the format mandates.
  *
  * Verification: MbtilesSpec walks the emitted file structurally AND
  * cross-checks it against an independent implementation (the
  * driver container's python sqlite3 stdlib) — every tile row and
  * metadata row must round-trip byte-exactly.
  */
private[graft] object Sqlite {

  val PageSize = 4096
  private val LockBytePage = 262145 // (1 << 30) / PageSize + 1

  // ---- SQL values and the record format -----------------------------

  sealed trait SqlVal
  final case class SqlInt(v: Long) extends SqlVal
  final case class SqlText(v: String) extends SqlVal
  final case class SqlBlob(v: Array[Byte]) extends SqlVal
  case object SqlNull extends SqlVal

  /** Big-endian 7-bit varint (1–9 bytes; 9th byte carries 8 bits). */
  def varint(v0: Long): Array[Byte] = {
    if (v0 >= 0 && v0 <= 127) return Array(v0.toByte)
    // collect 7-bit groups little-end first; 9-byte case keeps low 8
    val out = new Array[Byte](9)
    var v = v0
    if ((v >>> 56) != 0 || v < 0) { // needs all 9 bytes
      out(8) = (v & 0xff).toByte
      v >>>= 8
      var i = 7
      while (i >= 0) { out(i) = ((v & 0x7f) | 0x80).toByte; v >>>= 7; i -= 1 }
      return out
    }
    var tmp = List.empty[Byte]
    while (v != 0) { tmp = (v & 0x7f).toByte :: tmp; v >>>= 7 }
    val arr = tmp.toArray
    var i = 0
    while (i < arr.length - 1) { arr(i) = (arr(i) | 0x80).toByte; i += 1 }
    arr
  }

  private def intSerial(v: Long): (Long, Array[Byte]) = v match {
    case 0 => (8L, Array.empty)
    case 1 => (9L, Array.empty)
    case _ =>
      def be(n: Int): Array[Byte] =
        (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      if (v >= -128 && v <= 127) (1L, be(1))
      else if (v >= -32768 && v <= 32767) (2L, be(2))
      else if (v >= -8388608 && v <= 8388607) (3L, be(3))
      else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(4))
      else if (v >= -140737488355328L && v <= 140737488355327L) (6L, be(6))
      else (8L, be(8))
  }

  /** Encode one record (row payload): header of serial types + body. */
  def record(values: Seq[SqlVal]): Array[Byte] = {
    val parts = values.map {
      case SqlInt(v) => intSerial(v)
      case SqlText(s) =>
        val b = s.getBytes("UTF-8"); (13L + 2L * b.length, b)
      case SqlBlob(b) => (12L + 2L * b.length, b)
      case SqlNull => (0L, Array.empty[Byte])
    }
    val serials = parts.map(p => varint(p._1))
    // header length includes its own varint: solve the (tiny) fixpoint
    // hlen = sum + len(varint(hlen)) instead of assuming one step —
    // a one-shot adjustment goes wrong exactly at varint width
    // boundaries (sum = 16382 would declare a 2-byte length that needs
    // 3 bytes)
    val sumSerials = serials.map(_.length).sum
    var hlen = sumSerials + 1
    while (hlen != sumSerials + varint(hlen.toLong).length)
      hlen = sumSerials + varint(hlen.toLong).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hlen))
    serials.foreach(out.write)
    parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  // ---- page sink -----------------------------------------------------

  /** Sequential page allocator over a RandomAccessFile; page 1 is
    * reserved for the header + sqlite_master and back-patched in
    * [[finish]].
    */
  final class Sink(raf: RandomAccessFile) {
    var nPages = 1
    raf.setLength(PageSize.toLong)

    /** Write one page, return its 1-based page number. */
    def write(page: Array[Byte]): Int = {
      require(page.length == PageSize)
      nPages += 1
      if (nPages == LockBytePage) { // format: the lock-byte page holds no data
        raf.seek((nPages - 1L) * PageSize)
        raf.write(new Array[Byte](PageSize))
        nPages += 1
      }
      raf.seek((nPages - 1L) * PageSize)
      raf.write(page)
      nPages
    }

    def patchPage1(content: Array[Byte]): Unit = {
      require(content.length == PageSize)
      raf.seek(0); raf.write(content)
    }
  }

  // ---- table b-tree (rowid) -------------------------------------------

  private val U = PageSize // usable (reserved-per-page = 0)
  private val TblMaxLocal = U - 35
  private val TblMinLocal = (U - 12) * 32 / 255 - 23

  /** Streaming bottom-up builder for one rowid-table b-tree. Rows must
    * arrive in ascending rowid order.
    */
  final class TableBuilder(sink: Sink) {
    private var cells = List.empty[Array[Byte]] // reversed
    private var cellBytes = 0
    private var nCells = 0
    // (page, maxRowid) per flushed leaf, in order
    private val leaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    private var lastRowid = Long.MinValue
    private var leafMaxRowid = Long.MinValue

    def addRow(rowid: Long, payload: Array[Byte]): Unit = {
      require(rowid > lastRowid, s"rowids must ascend: $rowid after $lastRowid")
      lastRowid = rowid
      val p = payload.length.toLong
      val cell = new java.io.ByteArrayOutputStream()
      if (p <= TblMaxLocal) {
        cell.write(varint(p)); cell.write(varint(rowid)); cell.write(payload)
      } else {
        val k = TblMinLocal + ((p - TblMinLocal) % (U - 4)).toInt
        val local = if (k <= TblMaxLocal) k else TblMinLocal
        // overflow chain first (their page numbers precede the leaf's —
        // legal: pages may appear in any order)
        val chunks = payload.drop(local).grouped(U - 4).toArray
        var next = 0
        for (i <- chunks.indices.reverse) {
          val pg = new Array[Byte](PageSize)
          writeBE32(pg, 0, next)
          System.arraycopy(chunks(i), 0, pg, 4, chunks(i).length)
          next = sink.write(pg)
        }
        cell.write(varint(p)); cell.write(varint(rowid))
        cell.write(payload, 0, local)
        val ov = new Array[Byte](4); writeBE32(ov, 0, next); cell.write(ov)
      }
      val c = cell.toByteArray
      if (nCells > 0 && 8 + 2 * (nCells + 1) + cellBytes + c.length > PageSize)
        flushLeaf()
      cells ::= c; cellBytes += c.length; nCells += 1; leafMaxRowid = rowid
    }

    private def flushLeaf(): Unit = {
      val page = assemblePage(0x0D, cells.reverse.toArray, rightMost = 0)
      leaves += ((sink.write(page), leafMaxRowid))
      cells = Nil; cellBytes = 0; nCells = 0
    }

    /** Flush and build interiors; returns the root page number. */
    def finish(): Int = {
      if (nCells > 0 || leaves.isEmpty) flushLeaf() // empty table = 1 empty leaf
      buildTableInteriors(sink, leaves.toSeq)
    }
  }

  private def buildTableInteriors(sink: Sink,
                                  level: Seq[(Int, Long)]): Int = {
    def cell(e: (Int, Long)): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val cb = new Array[Byte](4); writeBE32(cb, 0, e._1); b.write(cb)
      b.write(varint(e._2)); b.toByteArray
    }
    buildInteriors[Long](sink, level, 0x05, cell)
  }

  /** One interior level, children packed by BYTE budget (12-byte
    * header + 2 B pointer + cell bytes ≤ page) — a fixed cells-per-page
    * count overflows the page as soon as the per-cell payload grows
    * (index dividers at deep zooms, table rowids ≥ 2^28: the r15-review
    * interior-overflow finding). Every page takes at least one cell
    * plus the rightmost child (a single cell always fits: cells are
    * ≤ ~1/4 page), so each level strictly shrinks.
    */
  private def buildInteriors[K](sink: Sink, level: Seq[(Int, K)],
      pageType: Int, cell: ((Int, K)) => Array[Byte]): Int = {
    if (level.length == 1) return level.head._1
    val next = scala.collection.mutable.ArrayBuffer.empty[(Int, K)]
    var i = 0
    while (i < level.length) {
      val cells = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var bytes = 0
      var cur = level(i); i += 1
      var open = true
      while (open && i < level.length) {
        val c = cell(cur)
        if (12 + 2 * (cells.length + 1) + bytes + c.length <= PageSize) {
          cells += c; bytes += c.length
          cur = level(i); i += 1
        } else open = false
      }
      val page = assemblePage(pageType, cells.toArray, rightMost = cur._1)
      next += ((sink.write(page), cur._2))
    }
    buildInteriors(sink, next.toSeq, pageType, cell)
  }

  // ---- index b-tree (unique, pre-sorted entries) ----------------------

  private val IdxMaxLocal = (U - 12) * 64 / 255 - 23

  /** Bottom-up unique-index builder. Entries must arrive in index
    * order; each entry lives at exactly ONE level (leaf, or promoted
    * as a divider). Payloads must fit locally (≤ [[IdxMaxLocal]]) —
    * MBTiles index keys are a few ints plus a rowid.
    */
  final class IndexBuilder(sink: Sink) {
    // (cell bytes, raw payload) — payloads retained so the leaf's last
    // entry can be promoted to a divider at the flush boundary
    private var cells = List.empty[(Array[Byte], Array[Byte])]
    private var cellBytes = 0
    private var nCells = 0
    // (page, dividerRecordAfter) pairs; last leaf has no divider
    private val leaves = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Option[Array[Byte]])]

    def addEntry(payload: Array[Byte]): Unit = {
      require(payload.length <= IdxMaxLocal,
        s"index entry ${payload.length}B exceeds local max $IdxMaxLocal")
      val cell = new java.io.ByteArrayOutputStream()
      cell.write(varint(payload.length.toLong)); cell.write(payload)
      val c = cell.toByteArray
      if (nCells > 0 && 8 + 2 * (nCells + 1) + cellBytes + c.length > PageSize) {
        // promote the leaf's LAST buffered entry — not the incoming
        // one — to the divider; the incoming entry then STARTS the new
        // leaf. Promoting the incoming entry instead leaves a dangling
        // divider when it is the build's final entry, and
        // buildIndexInteriors would silently drop it at the root (the
        // r15-review missing-index-row finding). The pop is always
        // legal: entries are ≤ IdxMaxLocal (~1/4 page), so an
        // overflowing leaf holds ≥ 4 cells, and the popped entry sorts
        // after everything left in the leaf and before the incoming one.
        val (lastCell, lastPayload) = cells.head
        cells = cells.tail; cellBytes -= lastCell.length; nCells -= 1
        flushLeaf(divider = Some(lastPayload))
      }
      cells ::= ((c, payload)); cellBytes += c.length; nCells += 1
    }

    private def flushLeaf(divider: Option[Array[Byte]]): Unit = {
      val page = assemblePage(0x0A, cells.reverse.map(_._1).toArray,
        rightMost = 0)
      leaves += ((sink.write(page), divider))
      cells = Nil; cellBytes = 0; nCells = 0
    }

    def finish(): Int = {
      if (nCells > 0 || leaves.isEmpty) flushLeaf(divider = None)
      buildIndexInteriors(sink, leaves.toSeq)
    }
  }

  private def buildIndexInteriors(sink: Sink,
      level: Seq[(Int, Option[Array[Byte]])]): Int = {
    def cell(e: (Int, Option[Array[Byte]])): Array[Byte] = {
      val payload = e._2.getOrElse(
        // a divider-less child can only be the global last; it never
        // becomes an interior CELL (only ever a rightmost pointer)
        throw new IllegalStateException("missing divider mid-level"))
      val b = new java.io.ByteArrayOutputStream()
      val cb = new Array[Byte](4); writeBE32(cb, 0, e._1); b.write(cb)
      b.write(varint(payload.length.toLong)); b.write(payload)
      b.toByteArray
    }
    buildInteriors[Option[Array[Byte]]](sink, level, 0x02, cell)
  }

  // ---- page assembly ---------------------------------------------------

  private def writeBE16(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >> 8) & 0xff).toByte; a(off + 1) = (v & 0xff).toByte
  }
  private def writeBE32(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >> 24) & 0xff).toByte; a(off + 1) = ((v >> 16) & 0xff).toByte
    a(off + 2) = ((v >> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
  }

  /** Assemble one b-tree page: header, cell pointer array ascending,
    * cell content packed from the page end. `headerAt` > 0 only for
    * page 1 (after the 100-byte file header).
    */
  def assemblePage(pageType: Int, cells: Array[Array[Byte]],
                   rightMost: Int, headerAt: Int = 0): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val interior = pageType == 0x05 || pageType == 0x02
    val hdrLen = if (interior) 12 else 8
    page(headerAt) = pageType.toByte
    writeBE16(page, headerAt + 3, cells.length)
    if (interior) writeBE32(page, headerAt + 8, rightMost)
    var content = PageSize
    val ptrBase = headerAt + hdrLen
    for (i <- cells.indices) {
      content -= cells(i).length
      System.arraycopy(cells(i), 0, page, content, cells(i).length)
      writeBE16(page, ptrBase + 2 * i, content)
    }
    require(ptrBase + 2 * cells.length <= content,
      s"page overflow: ${cells.length} cells, content at $content")
    writeBE16(page, headerAt + 5, content)
    page
  }

  // ---- read side -------------------------------------------------------
  // Enough of the format to WALK a database someone else wrote (the
  // reference ecosystem's tippecanoe/tile-join emit these): header,
  // table b-trees, overflow chains, record decoding. Index b-trees are
  // ignored — ingest is a full table scan. WAL databases with
  // un-checkpointed frames are out of scope (tippecanoe closes its
  // databases; a closed db is fully in the main file).

  /** (pageSize, usable bytes per page) from a database header. */
  def readDbHeader(in: java.io.RandomAccessFile): (Int, Int) = {
    val hdr = new Array[Byte](100)
    in.seek(0); in.readFully(hdr)
    require(new String(hdr, 0, 15, "ISO-8859-1") == "SQLite format 3",
      "not a SQLite database")
    val psRaw = ((hdr(16) & 0xff) << 8) | (hdr(17) & 0xff)
    val pageSize = if (psRaw == 1) 65536 else psRaw
    val reserved = hdr(20) & 0xff
    (pageSize, pageSize - reserved)
  }

  def readPage(in: java.io.RandomAccessFile, pageSize: Int,
               pageNo: Int): Array[Byte] = {
    val b = new Array[Byte](pageSize)
    in.seek((pageNo - 1L) * pageSize); in.readFully(b); b
  }

  /** Parse a varint at `off`; returns (value, bytes consumed). */
  def parseVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xff
      if ((x & 0x80) == 0) return (v << 7 | x, i + 1)
      v = v << 7 | (x & 0x7f); i += 1
    }
    (v << 8 | (b(off + 8) & 0xff), 9)
  }

  /** Decode a record payload into column values: Long / Double /
    * String / Array[Byte] / null.
    */
  def decodeRecord(p: Array[Byte]): IndexedSeq[Any] = {
    val (hlen, h0) = parseVarint(p, 0)
    var ho = h0
    val serials = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (ho < hlen) {
      val (s, n) = parseVarint(p, ho); serials += s; ho += n
    }
    var off = hlen.toInt
    serials.map { s =>
      def intN(n: Int): Long = {
        var v = (p(off).toLong << 56) >> 56 // sign-extend first byte
        for (i <- 1 until n) v = (v << 8) | (p(off + i) & 0xffL)
        off += n; v
      }
      s match {
        case 0 => null
        case 1 => intN(1)
        case 2 => intN(2)
        case 3 => intN(3)
        case 4 => intN(4)
        case 5 => intN(6)
        case 6 => intN(8)
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(intN(8)); v
        case 8 => 0L
        case 9 => 1L
        case t if t >= 13 && t % 2 == 1 =>
          val n = ((t - 13) / 2).toInt
          val v = new String(p, off, n, "UTF-8"); off += n; v
        case t if t >= 12 && t % 2 == 0 =>
          val n = ((t - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(p, off, off + n); off += n; v
        case t => throw new IllegalStateException(s"serial type $t")
      }
    }.toIndexedSeq
  }

  /** All leaf page numbers of a table b-tree, left to right — the
    * interior walk touches only interior pages (a driver-side handful
    * even for GB-scale tables).
    */
  def tableLeaves(in: java.io.RandomAccessFile, pageSize: Int,
                  root: Int): Seq[Int] = {
    val page = readPage(in, pageSize, root)
    val hdrAt = if (root == 1) 100 else 0
    page(hdrAt) & 0xff match {
      case 0x0D => Seq(root)
      case 0x05 =>
        val n = ((page(hdrAt + 3) & 0xff) << 8) | (page(hdrAt + 4) & 0xff)
        val kids = (0 until n).map { i =>
          val po = hdrAt + 12 + 2 * i
          val cellAt = ((page(po) & 0xff) << 8) | (page(po + 1) & 0xff)
          ((page(cellAt) & 0xff) << 24) | ((page(cellAt + 1) & 0xff) << 16) |
            ((page(cellAt + 2) & 0xff) << 8) | (page(cellAt + 3) & 0xff)
        } :+ (((page(hdrAt + 8) & 0xff) << 24) | ((page(hdrAt + 9) & 0xff) << 16) |
          ((page(hdrAt + 10) & 0xff) << 8) | (page(hdrAt + 11) & 0xff))
        kids.flatMap(tableLeaves(in, pageSize, _))
      case t => throw new IllegalStateException(s"page type $t in table walk")
    }
  }

  /** Every entry payload of an index b-tree, in index order — the
    * in-order walk EMITS interior divider cells between their child
    * subtrees (an index entry lives at exactly one level, so the walk
    * is the only complete readout). Verification surface for
    * [[IndexBuilder]]: a dropped or duplicated divider shows up as a
    * missing/extra entry here before sqlite's integrity_check ever
    * runs. Payloads must be local (no overflow chains) — true for
    * everything this writer emits ([[IndexBuilder]] requires it).
    */
  def indexEntries(in: java.io.RandomAccessFile, pageSize: Int, usable: Int,
                   root: Int): Seq[Array[Byte]] = {
    val idxMaxLocal = (usable - 12) * 64 / 255 - 23
    val page = readPage(in, pageSize, root)
    val hdrAt = if (root == 1) 100 else 0
    val n = ((page(hdrAt + 3) & 0xff) << 8) | (page(hdrAt + 4) & 0xff)
    page(hdrAt) & 0xff match {
      case 0x0A =>
        (0 until n).map { i =>
          val po = hdrAt + 8 + 2 * i
          var at = ((page(po) & 0xff) << 8) | (page(po + 1) & 0xff)
          val (p, n1) = parseVarint(page, at); at += n1
          require(p <= idxMaxLocal, s"index payload $p overflows (unsupported)")
          java.util.Arrays.copyOfRange(page, at, at + p.toInt)
        }
      case 0x02 =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        for (i <- 0 until n) {
          val po = hdrAt + 12 + 2 * i
          var at = ((page(po) & 0xff) << 8) | (page(po + 1) & 0xff)
          val child = ((page(at) & 0xff) << 24) | ((page(at + 1) & 0xff) << 16) |
            ((page(at + 2) & 0xff) << 8) | (page(at + 3) & 0xff)
          at += 4
          val (p, n1) = parseVarint(page, at); at += n1
          require(p <= idxMaxLocal, s"index payload $p overflows (unsupported)")
          out ++= indexEntries(in, pageSize, usable, child)
          out += java.util.Arrays.copyOfRange(page, at, at + p.toInt)
        }
        val rightMost = ((page(hdrAt + 8) & 0xff) << 24) |
          ((page(hdrAt + 9) & 0xff) << 16) |
          ((page(hdrAt + 10) & 0xff) << 8) | (page(hdrAt + 11) & 0xff)
        out ++= indexEntries(in, pageSize, usable, rightMost)
        out.toSeq
      case t => throw new IllegalStateException(s"page type $t in index walk")
    }
  }

  /** (rowid, reassembled payload) for every cell of one table leaf,
    * following overflow chains.
    */
  def leafRows(in: java.io.RandomAccessFile, pageSize: Int, usable: Int,
               leafNo: Int): Seq[(Long, Array[Byte])] = {
    val maxLocal = usable - 35
    val minLocal = (usable - 12) * 32 / 255 - 23
    val page = readPage(in, pageSize, leafNo)
    val hdrAt = if (leafNo == 1) 100 else 0
    require((page(hdrAt) & 0xff) == 0x0D, s"page $leafNo is not a table leaf")
    val n = ((page(hdrAt + 3) & 0xff) << 8) | (page(hdrAt + 4) & 0xff)
    (0 until n).map { i =>
      val po = hdrAt + 8 + 2 * i
      var at = ((page(po) & 0xff) << 8) | (page(po + 1) & 0xff)
      val (p, n1) = parseVarint(page, at); at += n1
      val (rowid, n2) = parseVarint(page, at); at += n2
      val local = if (p <= maxLocal) p.toInt else {
        val k = minLocal + ((p - minLocal) % (usable - 4)).toInt
        if (k <= maxLocal) k else minLocal
      }
      val payload = new Array[Byte](p.toInt)
      System.arraycopy(page, at, payload, 0, local)
      if (local < p) {
        var next = ((page(at + local) & 0xff) << 24) |
          ((page(at + local + 1) & 0xff) << 16) |
          ((page(at + local + 2) & 0xff) << 8) | (page(at + local + 3) & 0xff)
        var got = local
        while (next != 0) {
          val ov = readPage(in, pageSize, next)
          next = ((ov(0) & 0xff) << 24) | ((ov(1) & 0xff) << 16) |
            ((ov(2) & 0xff) << 8) | (ov(3) & 0xff)
          val take = math.min(usable - 4, p.toInt - got)
          System.arraycopy(ov, 4, payload, got, take)
          got += take
        }
        require(got == p, s"overflow chain short: $got of $p")
      }
      (rowid, payload)
    }
  }

  /** Decode sqlite_master: (type, name, tbl_name, rootpage, sql).
    * Views carry rootpage 0 (or NULL in some writers).
    */
  def readMaster(in: java.io.RandomAccessFile, pageSize: Int, usable: Int)
      : Seq[(String, String, String, Int, String)] =
    tableLeaves(in, pageSize, 1).flatMap(leafRows(in, pageSize, usable, _))
      .map { case (_, payload) =>
        val r = decodeRecord(payload)
        (r(0).asInstanceOf[String], r(1).asInstanceOf[String],
          r(2).asInstanceOf[String],
          Option(r(3)).map(_.asInstanceOf[Long].toInt).getOrElse(0),
          Option(r(4)).map(_.asInstanceOf[String]).getOrElse(""))
      }

  /** Column order of a stored `CREATE TABLE name (col type, …)`
    * statement — readers must decode records by the WRITER's order,
    * not an assumed one. Depth-aware comma split skips table-level
    * constraint clauses (`primary key (…)` etc.).
    */
  def tableColumns(createSql: String): Seq[String] = {
    val inner = createSql.substring(createSql.indexOf('(') + 1,
      createSql.lastIndexOf(')'))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    inner.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    val constraint = Set("primary", "unique", "check", "foreign", "constraint")
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split("[\\s(]+")(0).replaceAll("[\"'`\\[\\]]", "").toLowerCase)
      .filterNot(constraint.contains)
  }

  // ---- file header + schema page --------------------------------------

  /** Build page 1: the 100-byte header plus the sqlite_master table
    * leaf holding the schema rows (type, name, tbl_name, rootpage,
    * sql) — callers guarantee the handful of rows fits one page.
    */
  def buildPage1(nPages: Int,
                 masterRows: Seq[(String, String, String, Int, String)])
      : Array[Byte] = {
    val cells = masterRows.zipWithIndex.map { case ((t, n, tn, root, sql), i) =>
      val payload = record(Seq(SqlText(t), SqlText(n), SqlText(tn),
        SqlInt(root.toLong), SqlText(sql)))
      require(payload.length <= TblMaxLocal, "schema row too large")
      val b = new java.io.ByteArrayOutputStream()
      b.write(varint(payload.length.toLong)); b.write(varint(i + 1L))
      b.write(payload); b.toByteArray
    }.toArray
    val page = assemblePage(0x0D, cells, rightMost = 0, headerAt = 100)
    val hdr = "SQLite format 3".getBytes("ISO-8859-1") :+ 0.toByte
    System.arraycopy(hdr, 0, page, 0, 16)
    writeBE16(page, 16, PageSize)
    page(18) = 1; page(19) = 1 // legacy file format (no WAL)
    page(21) = 64; page(22) = 32; page(23) = 32
    writeBE32(page, 24, 1) // change counter
    writeBE32(page, 28, nPages) // in-header db size
    writeBE32(page, 40, 1) // schema cookie
    writeBE32(page, 44, 4) // schema format
    writeBE32(page, 56, 1) // UTF-8
    writeBE32(page, 92, 1) // version-valid-for == change counter
    writeBE32(page, 96, 3045000) // write-library version
    page
  }
}
