package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Extents, Shape}

/** Seeded-random property tests for the Spark operators (SURVEY.md §5
  * item 3): pivot/unpivot invariants and extents ordering over generated
  * long tables.
  */
class PivotPropertiesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def randomLong(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val years = Seq("00", "01", "02")
    val rows = for {
      id <- (0 until 30).map(i => f"${rnd.nextInt(20)}%05d")
      y <- years if rnd.nextBoolean()
    } yield (id, y, rnd.nextDouble() * 100, rnd.nextLong(1000000))
    rows.toDF("id", "yy", "v", "ord")
  }

  test("pivot row count == distinct ids; cells match max_by oracle (seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val long = randomLong(seed).cache()
      val wide = Shape.pivotWide(long, "id", Nil, "yy", Seq("v"),
        Seq("00", "01", "02"), "ord")
      assert(wide.count() == long.select("id").distinct().count())
      // unpivot(pivot) == last-wins-reduced original
      val back = wide.selectExpr("id",
        "stack(3, '00', `v-00`, '01', `v-01`, '02', `v-02`) as (yy, v)")
        .filter($"v".isNotNull)
      val reduced = long.groupBy("id", "yy").agg(max_by($"v", $"ord").as("v"))
      assert(back.except(reduced).count() == 0)
      assert(reduced.except(back).count() == 0)
      long.unpersist()
    }
  }

  test("extents invariants hold for random numeric tables (seeds)") {
    for (seed <- Seq(3, 9)) {
      val rnd = new scala.util.Random(seed)
      val df = (0 until 200).map(_ => (rnd.nextDouble() * 1000 - 500,
        rnd.nextGaussian())).toDF("a", "b")
      val rows = Extents.extents(df, Seq("a", "b")).collect()
      assert(rows.length == 2)
      for (r <- rows) {
        val (mn, mx, q1, q99) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))
        assert(mn <= q1 && q1 <= q99 && q99 <= mx)
      }
    }
  }

  test("rename is a bijection on mapped columns (no collisions, order kept)") {
    val mapping = Seq("a" -> "x", "b" -> "y", "c" -> "z")
    val df = Seq((1, 2, 3, 4)).toDF("a", "b", "c", "unmapped")
    val out = Shape.renameColumns(df, mapping)
    assert(out.columns.toSeq == Seq("x", "y", "z"))
    assert(mapping.map(_._2).distinct.length == mapping.length)
  }
}
