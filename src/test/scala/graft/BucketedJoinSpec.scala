package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Bucketed co-located joins: two tables written with the same
  * (buckets, key) layout must join with ZERO exchanges — the
  * pay-the-shuffle-once-at-write technique for repeated fact-fact
  * joins where neither side broadcasts.
  */
class BucketedJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("same-layout bucketed tables join with zero exchanges") {
    val a = (1 to 5000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sources.writeBucketed(a, "bj_a", "k", 8)
    Sources.writeBucketed(b, "bj_b", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bj_a").join(spark.table("bj_b"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"),
        s"large-large equi-join should sort-merge:\n$p")
      assert(!p.contains("Exchange"),
        s"matching bucket layouts must join with NO shuffle:\n$p")
      assert(joined.count() == 5000)
      // the trap the scaladoc documents: a path read forgets the
      // bucket metadata and the same join shuffles again
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val pathRead = spark.read.parquet(s"$warehouse/bj_a")
        .join(spark.read.parquet(s"$warehouse/bj_b"), "k")
      assert(pathRead.queryExecution.executedPlan.toString
          .contains("Exchange"),
        "path-based read must NOT silently claim bucket co-location")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
    }
  }
}
