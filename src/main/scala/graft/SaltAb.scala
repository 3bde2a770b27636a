package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Salted-vs-plain join A/B on a deliberately hot-keyed fixture — the
  * measurement that makes q130's skew profile EXECUTABLE (the r13
  * verdict's "the profiler currently informs nothing executable"):
  * [[Joins.skewVerdict]] reads the profile, [[Joins.skewAwareJoin]]
  * acts on it, and this main proves the action is worth taking by
  * timing both arms on the same data.
  *
  * Fixture: lineitem at `factor`× (in-memory key-shifted union, the
  * ScaleUp recipe), with 90% of all rows re-pointed at one supplier
  * key (deterministic hash split, not rand()) — the null-heavy /
  * default-value foreign-key shape that drowns one reducer at 100 TB.
  * The small side is the distinct supplier table with a payload.
  *
  * Arms (all fully evaluated via noop write, warm min-of-two — the
  * OneQ protocol):
  *  - plain:   big ⋈ small on the hot key;
  *  - salted8: [[Joins.saltedJoin]] at the legacy hardcoded factor 8;
  *  - derived: [[Joins.saltedJoin]] at [[Joins.derivedSaltFactor]] —
  *    fan-out sized from the measured max/mean, capped at shuffle
  *    partitions (the r14 verdict's "the decision wire should carry
  *    the magnitude too", measured rather than asserted).
  * Each arm runs with AQE skew-split ON (the default — Spark may
  * already mitigate; the honest baseline) and OFF (the regime where
  * only explicit salting helps: skew split applies to sort-merge
  * joins, and a broadcastable small side or a map-side-agg consumer
  * never triggers it).
  *
  * Also prints the [[Joins.skewVerdict]] line for the hot and the
  * original (uniform) key column, so the decision thresholds are
  * anchored to measured profiles, not guesses.
  *
  * Usage: runMain graft.SaltAb [sfDir] [factor]
  *        (default: /root/testdata/sf0.1, 10)
  */
object SaltAb {

  private val LegacyFactor = 8

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li0 = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val big0 = (0 until factor).map { i =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
    // hot key: 90% of ALL rows re-point at supplier 1 (deterministic) —
    // the default-value/null-bucket foreign-key pathology, where one
    // reducer holds most of the stage while the rest idle
    val big = big0.withColumn("l_suppkey",
        when(pmod(hash(col("l_orderkey")), lit(10)) =!= 0, lit(1L))
          .otherwise(col("l_suppkey")))
      .localCheckpoint(eager = true)
    val small = big.select(col("l_suppkey")).distinct()
      .withColumn("payload", md5(col("l_suppkey").cast("string")))
      .localCheckpoint(eager = true)
    println(s"[saltab] big=${big.count()} rows, small=${small.count()} keys, " +
      s"factor=$factor")

    val hot = Joins.skewVerdict(big, "l_suppkey")
    val uni = Joins.skewVerdict(big0, "l_suppkey")
    println(f"[saltab] verdict hot: salt=${hot.salt} top1=${hot.top1Share}%.4f " +
      f"maxOverMean=${hot.maxOverMean}%.1f gini=${hot.gini}%.4f")
    println(f"[saltab] verdict uniform: salt=${uni.salt} top1=${uni.top1Share}%.4f " +
      f"maxOverMean=${uni.maxOverMean}%.1f gini=${uni.gini}%.4f")

    // the consumer: a grouped rollup over the joined rows (forces the
    // full join to materialize; count alone lets Catalyst prune)
    def consume(j: DataFrame): Unit =
      j.groupBy("payload").agg(sum("l_quantity")).write
        .format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      body // warm
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }
    // prevent the small side from broadcasting: the skew regime under
    // test is the SHUFFLE join (a broadcast join has no reducers to
    // drown — and real 100 TB dims often exceed the broadcast budget)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val derived = Joins.derivedSaltFactor(hot.maxOverMean,
      spark.sessionState.conf.numShufflePartitions)
    println(s"[saltab] derivedSaltFactor=$derived (legacy=$LegacyFactor)")
    for (aqeSkew <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew)
      val plain = timed(consume(big.join(small, Seq("l_suppkey"))))
      val salted8 = timed(consume(
        Joins.saltedJoin(big, small, "l_suppkey", "l_orderkey", LegacyFactor)))
      val saltedD = timed(consume(
        Joins.saltedJoin(big, small, "l_suppkey", "l_orderkey", derived)))
      println(f"[saltab] aqeSkew=$aqeSkew plain=$plain%.2f s " +
        f"salted8=$salted8%.2f s saltedD=$saltedD%.2f s " +
        f"ratio8=${plain / salted8}%.2f ratioD=${plain / saltedD}%.2f")
    }
    spark.stop()
  }
}
