package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer for the training-data pipeline tier:
  * LEARN a merge table from corpus pair frequencies, ENCODE the corpus
  * against it. Replaces the regex sub-token stand-in
  * ([[TextStats.bpeTokenCount]]) wherever a pipeline budgets, packs, or
  * chunks by real tokenizer tokens.
  *
  * Spark-first design notes (100 TB scale):
  *  - merges never cross word boundaries (the standard pre-tokenizer
  *    contract), so learning needs only the WORD-FREQUENCY table — the
  *    corpus is scanned ONCE (one explode + hash-agg shuffle of (word,
  *    count) pairs, partial-agg'd map-side); every learning round then
  *    runs over the vocabulary table, which is orders of magnitude
  *    smaller than the corpus (and is additionally capped to its
  *    `maxVocab` most frequent words with a deterministic tie-break —
  *    the long tail carries negligible pair mass; a deployment can
  *    also learn from a sampled corpus, same contract).
  *  - each round is ONE distributed aggregation over the vocabulary
  *    (adjacent-pair counts weighted by word count) + a 1-row argmax
  *    collect + a per-row merge application; the frame is
  *    `localCheckpoint`ed per round so plan size AND lineage stay
  *    linear in rounds (the q50 connected-components pattern).
  *  - encoding is [[graft.functions.BpeEncodeExpr]]: the learned table
  *    ships inside the expression (broadcast-by-value), encode is a
  *    pure map-side projection — the corpus never shuffles.
  *
  * Determinism: pair argmax breaks ties by (count desc, left asc,
  * right asc); vocabulary cap by (count desc, word asc); merge
  * application is a greedy left-to-right fold. Learning twice over the
  * same corpus yields byte-identical tables (BpeSpec).
  */
object Bpe {

  /** One learned merge: `left` + `right` → `left+right`, ranked 1-based
    * in learning order (lower rank = applied earlier at encode time).
    */
  final case class Merge(rank: Int, left: String, right: String)

  /** (word, cnt) frequency table of the corpus — the single corpus
    * scan everything else derives from.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of ONE merge to a symbol array —
    * the fold the learner uses each round. Public so the spec can pin
    * fold/priority-encoder equivalence.
    */
  def applyMerge(syms: Column, left: String, right: String): Column = {
    val merged = lit(left + right)
    when(size(syms) < 2, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        slice(syms, 1, 1),
        (acc, s) =>
          when(element_at(acc, -1) === left && s === right,
            concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
            .otherwise(concat(acc, array(s)))))
  }

  /** Learn up to `numMerges` merges from a (word, cnt) table. Stops
    * early when the best remaining pair's weighted count drops below
    * `minPairCount` (a pair seen once is noise, not structure).
    *
    * `checkpointEvery` bounds plan depth: between checkpoints each
    * round nests one more `aggregate` fold over the symbol column, so
    * the barrier fires every few rounds instead of every round (a
    * checkpoint is one eager job — on a small vocabulary the job
    * overhead, not the fold, dominates the round).
    */
  def learnMerges(words: DataFrame, numMerges: Int,
                  maxVocab: Int = 65536,
                  minPairCount: Long = 2L,
                  checkpointEvery: Int = 4): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    var syms = words
      .orderBy(col("cnt").desc, col("word").asc).limit(maxVocab)
      .select(col("cnt"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
      .localCheckpoint()
    val out = ArrayBuffer.empty[Merge]
    var r = 1
    var stopped = false
    while (r <= numMerges && !stopped) {
      val best = syms
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("c") < minPairCount) {
        stopped = true
      } else {
        val (l, rt) = (best(0).getAs[String]("l"), best(0).getAs[String]("r"))
        out += Merge(r, l, rt)
        syms = syms.withColumn("syms", applyMerge(col("syms"), l, rt))
        if (r % checkpointEvery == 0) syms = syms.localCheckpoint()
        r += 1
      }
    }
    out.toSeq
  }

  /** Flattened BPE token array of an already-normalized text column —
    * encode-side entry (native expression, map-side, no shuffle).
    */
  def encode(norm: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeEncodeExpr.encode(
      norm, merges.sortBy(_.rank).map(m => (m.left, m.right)))
}
