package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** SemDeDup cluster-geometry A/B at the 100× embedding scale — the
  * SURVEY §6.2 "k ∝ n trade" measurement (carried since r10). The
  * shipped q86 geometry keeps the coarse quantizer's 4√n lists, so
  * occupancy grows √n-fold and crosses the 64-anchor cap between sf0.1
  * and 100× — the ~13.6× growth band §6.2 documents. The paper's own
  * scaling keeps occupancy CONSTANT (k ∝ n); the scale-right route to
  * that is [[Similarity.subClusterAssignment]]: reuse the persisted
  * coarse assignment and split each cell locally to `targetOcc`.
  *
  * Per scale dir this main measures, against the SAME persisted
  * clustering table q86 serves from:
  *  - A: `maxAnchorCosine` over the coarse assignment (shipped path);
  *  - B: the sub-cluster build (timed separately — it is the one-time
  *    persisted artifact), then `maxAnchorCosine` over the refined
  *    assignment read back from parquet (deployment shape).
  * Serve walls are warm (one untimed run, min of two timed — the OneQ
  * protocol, local[4]); both paths also report their cluster count,
  * max occupancy, and dropped-row count at tau = 0.95 — the finer
  * geometry trades some cross-pair recall for bounded pair work, and
  * the trade is only honest with both numbers on the table.
  *
  * A dir argument of the form `synth:<n>` (r14) generates — once,
  * deterministically — an n-vector DISTINCT-mass corpus: 500 cluster
  * centers, each member = center + per-id noise at one of three
  * amplitudes (pair cosines ≈ 0.98 / 0.94 / 0.89 — straddling
  * tau = 0.95), every vector unique. The ×100 ScaleUp corpus is
  * duplicate-heavy (100 exact copies of each base vector), where
  * cap-bound anchors already catch almost all drops; the synth corpus
  * is the geometry's VALUE case — hundreds of distinct vectors
  * crowding each cell, far past the 64-anchor cap, where only
  * occupancy control can keep the pair stage honest.
  *
  * Usage: runMain graft.SemScale [sfDir | synth:<n> ...]
  *        (default: /root/testdata/sf0.1 /tmp/scale100)
  */
object SemScale {

  private val SemTau = 0.95
  private val SemCap = 64
  private val TargetOcc = 16
  private val SubDir = "/tmp/graft_fixtures/sem_subclusters"

  /** Build (once) the deterministic distinct-mass corpus: components
    * are hash-derived uniforms — no Random, no Date — so every rerun
    * reads back the identical table.
    */
  private def synthDir(spark: SparkSession, n: Long): String = {
    val dir = s"/tmp/graft_synth/emb_$n"
    val path = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) {
      val centers = 500
      spark.range(n).select(col("id").as("vec_id"))
        .select(col("vec_id"),
          expr(s"""transform(sequence(0, 63), j -> CAST(
                  |  (pmod(xxhash64(pmod(vec_id, $centers), j), 2000001)
                  |     / 1000000.0 - 1.0)
                  |  + (0.15 + 0.1 * pmod(vec_id, 3)) *
                  |    (pmod(xxhash64(vec_id, j, 7), 2000001)
                  |       / 1000000.0 - 1.0)
                  |AS FLOAT))""".stripMargin).as("embedding"),
          pmod(col("vec_id"), lit(10)).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[semscale] synthesized $n distinct vectors -> $dir")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/scale100")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (d0 <- dirs) {
      val d = if (d0.startsWith("synth:")) {
        synthDir(spark, d0.stripPrefix("synth:").toLong)
      } else d0
      val coarse = QueriesSim.semClusters(spark, d).localCheckpoint()
      val n = coarse.count()
      val k1 = QueriesSim.pqResidualCoarse(spark, d).size

      // B's one-time build: local split of the persisted coarse table
      val subPath = s"$SubDir/$n"
      val tb0 = System.nanoTime()
      Similarity.subClusterAssignment(coarse, "vec_id", "embedding",
          TargetOcc)
        .write.mode("overwrite").parquet(subPath)
      val buildWall = (System.nanoTime() - tb0) / 1e9
      val refined = spark.read.parquet(subPath)

      def stats(assigned: DataFrame): (Long, Long) = {
        val occ = assigned.groupBy("cid").agg(count(lit(1)).as("occ"))
          .agg(count(lit(1)).as("k"), max("occ").as("mx")).head()
        (occ.getLong(0), occ.getLong(1))
      }
      def serve(assigned: DataFrame, clusters: Int): Unit =
        Similarity.semanticDedupAssigned(assigned, "vec_id", "embedding",
            SemTau, maxCluster = SemCap, clusters = clusters)
          .write.format("noop").mode("overwrite").save()
      def timed(assigned: DataFrame, clusters: Int): Double = {
        serve(assigned, clusters) // warm
        def once(): Double = {
          val t0 = System.nanoTime()
          serve(assigned, clusters)
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      def dropped(assigned: DataFrame, clusters: Int): Long =
        Similarity.semanticDedupAssigned(assigned, "vec_id", "embedding",
            SemTau, maxCluster = SemCap, clusters = clusters)
          .where(!col("kept")).count()

      for ((label, assigned, clusters) <- Seq(
          ("coarse-4sqrtn", coarse, k1),
          ("subcluster-kpropn", refined, (n / TargetOcc).toInt.max(1)))) {
        val (kAct, occMax) = stats(assigned)
        val wall = timed(assigned, clusters)
        val drop = dropped(assigned, clusters)
        println(f"""{"dir":"$d","path":"$label","n":$n,""" +
          f""""clusters":$kAct,"occ_max":$occMax,"serve_wall_s":$wall%.2f,""" +
          f""""dropped_tau095":$drop,"build_wall_s":${
            if (label.startsWith("sub")) f"$buildWall%.2f" else "0.0"}}""")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
