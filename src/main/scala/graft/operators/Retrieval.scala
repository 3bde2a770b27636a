package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the serving stage that combines a sparse
  * (BM25) and a dense (embedding-cosine) ranking into one result list,
  * the standard production retrieval shape (and the RAG data-pipeline
  * face of it: fused rankings drive what gets packed into context).
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009):
    * `score(q, d) = Σ_runs 1 / (rrfK + rank_run(q, d))` over every run
    * that retrieved `d` for `q`, then the per-query top `topK` by
    * (score desc, id) — rank-only fusion, immune to the incomparable
    * score scales of its legs (BM25 sums vs cosines).
    *
    * Each run is a per-query ranked result table `(qCol, idCol, rank)`
    * with rank ≥ 1 (ranks beyond a leg's own top-N are simply absent —
    * the standard RRF treatment: missing ⇒ contributes 0).
    *
    * Exactness: each contribution rounds to integer MICRO units before
    * the sum (`round(10⁶/(rrfK+rank))` — a long), so the aggregate is
    * order-independent however Spark partitions the union, and the SQL
    * twin reproduces it cell-exact; the final score is one division,
    * rounded to `roundTo`.
    *
    * Scale shape: the legs are already per-query top-N (|queries|·N
    * rows — run output, never corpus data), so the fusion's one
    * shuffle moves only run rows on (q, id); the final top-k is a
    * rank-pruned window (WindowGroupLimit map-side at the threshold).
    */
  def rrfFuse(runs: Seq[DataFrame], qCol: String, idCol: String,
              rrfK: Int = 60, topK: Int = 10,
              roundTo: Int = 6): DataFrame = {
    require(runs.nonEmpty && rrfK >= 0 && topK >= 1)
    val contributions = runs
      .map(_.select(col(qCol), col(idCol),
        round(lit(1000000.0) / (lit(rrfK) + col("rank")))
          .cast("long").as("__c_micro")))
      .reduce(_ unionByName _)
    val fused = contributions
      .groupBy(col(qCol), col(idCol))
      .agg(round(sum("__c_micro") / 1000000.0, roundTo).as("rrf_score"),
        count(lit(1)).as("n_runs"))
    val w = Window.partitionBy(qCol).orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rrf_rank", row_number().over(w))
      .where(col("rrf_rank") <= topK)
      .select(col(qCol), col("rrf_rank"), col(idCol),
        col("rrf_score"), col("n_runs"))
  }
}
