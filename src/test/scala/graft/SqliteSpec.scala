package graft

import java.io.RandomAccessFile
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sqlite
import graft.sinks.Sqlite._

/** Unit-level b-tree builder tests for the hand-written SQLite writer,
  * aimed at the page-boundary regimes the MbtilesSpec fixtures don't
  * reach (its containers are verified end-to-end by python's sqlite3;
  * these tests pin the builder arithmetic directly):
  *
  *  - an index build whose FINAL entry lands exactly on a leaf flush —
  *    the r15-review high finding: the old builder promoted the
  *    incoming entry to a divider, and a divider with no following
  *    leaf was silently dropped at the root (one tile missing from the
  *    UNIQUE index, integrity_check "row missing from index");
  *  - interior pages packed by BYTE budget, not fixed cell counts —
  *    the old fixed groups (200 index / 400 table) overflow the 4096 B
  *    page once divider payloads or rowid varints grow (deep-zoom
  *    coords, rowids ≥ 2^28) and crashed assemblePage mid-write.
  *
  * Verification reads the trees back with [[Sqlite.indexEntries]] (an
  * in-order walk that EMITS interior dividers — the only complete
  * readout of an index, where each entry lives at exactly one level)
  * and [[Sqlite.tableLeaves]]/[[Sqlite.leafRows]].
  */
class SqliteSpec extends AnyFunSuite {

  private def withDb[A](f: (RandomAccessFile, Sink) => A): A = {
    val p = Files.createTempFile("sqlspec", ".db")
    val raf = new RandomAccessFile(p.toFile, "rw")
    try f(raf, new Sink(raf))
    finally { raf.close(); Files.deleteIfExists(p) }
  }

  /** 102-byte payload carrying its ordinal in the first 4 bytes. */
  private def payload(i: Int, size: Int = 102): Array[Byte] = {
    val b = new Array[Byte](size)
    b(0) = (i >> 24).toByte; b(1) = (i >> 16).toByte
    b(2) = (i >> 8).toByte; b(3) = i.toByte
    java.util.Arrays.fill(b, 4, size, (i % 251).toByte)
    b
  }
  private def ordinal(p: Array[Byte]): Int =
    ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) |
      ((p(2) & 0xff) << 8) | (p(3) & 0xff)

  test("index keeps EVERY entry across all leaf-boundary alignments (N sweep)") {
    // fixed 102 B payloads → 104 B cells → a leaf takes 38 entries and
    // the 39th forces a flush; sweeping N over three full leaf cycles
    // crosses every alignment, including final-entry-on-boundary (the
    // r15 dropped-entry case, N = 38+k·38-ish under the old packing)
    for (n <- 1 to 120) {
      val entries = withDb { (raf, sink) =>
        val b = new IndexBuilder(sink)
        (0 until n).foreach(i => b.addEntry(payload(i)))
        val root = b.finish()
        indexEntries(raf, PageSize, PageSize, root).map(ordinal)
      }
      assert(entries == (0 until n).toList.map(identity),
        s"index walk at N=$n returned ${entries.size} entries")
    }
  }

  test("index interiors pack by byte budget across two interior levels") {
    // 30 B payloads → 35 B interior cells: 125 leaves exceed one
    // interior page's BYTE capacity (~110 cells) while staying far
    // under the old fixed 200-cell group, which would assemble a
    // 4600 B page and crash — this test fails on count-based packing
    val n = 15000
    val entries = withDb { (raf, sink) =>
      val b = new IndexBuilder(sink)
      (0 until n).foreach(i => b.addEntry(payload(i, size = 30)))
      val root = b.finish()
      indexEntries(raf, PageSize, PageSize, root).map(ordinal)
    }
    assert(entries.size == n)
    assert(entries == (0 until n).toList, "in-order walk must be 0..n-1")
  }

  test("table interiors survive rowids >= 2^28 (5-byte rowid varints)") {
    // 500 B payloads → 8 rows per leaf → 402 leaves; interior cells are
    // 4 B child + 5 B varint(rowid): the old fixed 400-cell group is a
    // 4412 B page (crash); byte packing splits it
    val n = 3216
    val base = 1L << 28
    val rows = withDb { (raf, sink) =>
      val b = new TableBuilder(sink)
      (0 until n).foreach(i => b.addRow(base + i, payload(i, size = 500)))
      val root = b.finish()
      tableLeaves(raf, PageSize, root)
        .flatMap(leafRows(raf, PageSize, PageSize, _))
    }
    assert(rows.size == n)
    assert(rows.map(_._1) == (0 until n).map(base + _),
      "rowids must read back in order")
    assert(rows.forall { case (rid, p) =>
      p.length == 500 && ordinal(p) == (rid - base).toInt })
  }

  test("an empty index still finishes to a valid single leaf") {
    val entries = withDb { (raf, sink) =>
      val b = new IndexBuilder(sink)
      val root = b.finish()
      indexEntries(raf, PageSize, PageSize, root)
    }
    assert(entries.isEmpty)
  }
}
