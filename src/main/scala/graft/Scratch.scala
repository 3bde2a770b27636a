package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Tables.documents(spark, d).count()
    for (rnd <- 1 to 2) {
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val near = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" extra tail noise appended here")).as("text")))
      val base = near
        .withColumn("sh", transform(Dedup.wordShingles("text", 3),
          x => graft.operators.TextStats.hash60(x)))
        .select(col("doc_id"), col("sh")).cache()
      time(s"r$rnd base cache")(base.count())
      val withSig = Dedup.minhashSignature(col("sh"), 12)
        .foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
      time(s"r$rnd signatures")(withSig.write.format("noop").mode("overwrite").save())
      val withBuckets = withSig
        .withColumn("buckets", Dedup.lshBuckets(4, 3))
        .drop((0 until 12).map(i => s"sig$i"): _*).cache()
      time(s"r$rnd buckets cache")(withBuckets.count())
      val pairs = Dedup.lshCandidatePairs(withBuckets, "doc_id")
      time(s"r$rnd candidate pairs")(pairs.write.format("noop").mode("overwrite").save())
      val out = pairs
        .join(base.select(col("doc_id").as("a"), col("sh").as("sa")), "a")
        .join(base.select(col("doc_id").as("b"), col("sh").as("sb")), "b")
        .select(col("a"), col("b"),
          round(Dedup.jaccard(col("sa"), col("sb")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time(s"r$rnd verify+full")(out.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
