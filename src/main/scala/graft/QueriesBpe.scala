package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Curation, TextStats}

/** BPE tokenizer queries (training-data pipeline tier, round 6): learn a
  * merge table from the corpus, encode the corpus with it (q69), and
  * feed the REAL token counts into sequence packing (q71 — the
  * integration the regex stand-in `TextStats.bpeTokenCount` was holding
  * the seat for: a training pipeline budgets and packs by tokenizer
  * tokens, not whitespace tokens).
  *
  * Oracle protocol: the ORACLE DOES NOT RE-LEARN. The learned merge
  * table is written as a parquet fixture keyed by corpus size
  * (`.../bpe_merges/<nDocs>/` — concurrent scale factors never clobber
  * each other; the oracle selects its corpus's table by matching
  * `corpus_docs` to `count(*)` of the documents it sees). The oracle
  * then APPLIES the fixture with a recursive CTE: each distinct word
  * starts as its character symbols at rank 1; each step merges the
  * LEFTMOST occurrence of the current rank's pair, advancing to the
  * next rank when the pair is absent — exhaustive-in-rank-order
  * application, provably equivalent to the priority algorithm the
  * native [[graft.functions.BpeEncodeExpr]] encoder runs (a merge's
  * pair can only be created by lower-rank merges; BpeSpec pins it).
  * Per-doc md5 over the space-joined token stream makes q69
  * segmentation-exact, not just count-exact.
  */
object QueriesBpe {
  import Tables._

  private val normSql = TextStats.normalizeSql("text")

  private[graft] val NumMerges = 24
  private val FixtureDir = "/tmp/graft_fixtures/bpe_merges"
  private val PackWindow = 512 // q66's window, now in BPE tokens
  private val PackBucket = 64L

  /** Learn the merge table and write the oracle fixture — shared by
    * q69 and q71 so either query is self-sufficient under Verify
    * (learning is deterministic: same corpus → byte-identical table →
    * idempotent fixture overwrite). Registered in
    * [[graft.operators.ArtifactCache]]: the merge table is an
    * immutable function of (corpus, NumMerges), so within one JVM it
    * is learned once and every consumer pays only the apply cost —
    * the persisted-model-registry pattern a deployment uses.
    */
  private def learnAndFixture(s: SparkSession, d: String): Seq[Bpe.Merge] =
    graft.operators.ArtifactCache.getOrLoadOrLearnOwned(
        s"bpe:$d:$NumMerges", FixtureDir, d) {
      // registry READ path: a persisted merge table for this corpus
      // size serves the encoder with zero learning jobs (rank order is
      // the table's semantics — restore it exactly)
      // corpus_dir check: two scale factors can share a doc count with
      // different content — a same-count foreign fixture must re-learn
      // (the learn overwrites it, so the count-keyed oracle stays right)
      val nDocs = documents(s, d).count()
      graft.operators.ArtifactCache.parquetFixture(s, s"$FixtureDir/$nDocs")
        .filter(_.columns.contains("corpus_dir")) // pre-provenance: re-learn
        .map(_.where(col("corpus_docs") === nDocs && col("corpus_dir") === d)
          .orderBy("merge_rank").collect().toSeq
          .map(r => Bpe.Merge(r.getAs[Int]("merge_rank"),
            r.getAs[String]("ml"), r.getAs[String]("mr"))))
        .filter(_.nonEmpty) // empty frame = torn/foreign dir: re-learn
    } {
      val docs = documents(s, d).select("doc_id", "text")
      val merges = Bpe.learnMerges(Bpe.wordCounts(docs, "text"), NumMerges)
      val nDocs = docs.count()
      import s.implicits._
      merges.map(m => (m.rank, m.left, m.right, nDocs, d))
        .toDF("merge_rank", "ml", "mr", "corpus_docs", "corpus_dir")
        .coalesce(1).write.mode("overwrite").parquet(s"$FixtureDir/$nDocs")
      merges
    }

  def q69BpeTokenize(s: SparkSession, d: String): DataFrame = {
    val merges = learnAndFixture(s, d)
    documents(s, d)
      .select(col("doc_id"), TextStats.normalize(col("text")).as("__norm"))
      .filter(length(col("__norm")) > 0)
      .select(col("doc_id"),
        (regexp_count(col("__norm"), lit(" ")) + 1).cast("long")
          .as("n_tokens"),
        Bpe.encode(col("__norm"), merges).as("__bpe"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__bpe")).cast("long").as("n_bpe_tokens"),
        md5(concat_ws(" ", col("__bpe")).cast("binary")).as("bpe_md5"))
      .orderBy("doc_id")
  }

  /** q66's packing bookkeeping driven by REAL tokenizer counts: learn
    * (or reuse) the merge table, count each document's BPE tokens with
    * the native encoder (map-side — the corpus never shuffles; the
    * range-bucketed prefix sum moves only per-bucket totals), then the
    * same window-span arithmetic.
    */
  def q71BpePacking(s: SparkSession, d: String): DataFrame = {
    val merges = learnAndFixture(s, d)
    val counted = documents(s, d)
      .select(col("doc_id"), TextStats.normalize(col("text")).as("__norm"))
      .filter(length(col("__norm")) > 0)
      .select(col("doc_id"),
        size(Bpe.encode(col("__norm"), merges)).cast("long").as("n_bpe"))
      .filter(col("n_bpe") > 0)
    Curation.packingOffsets(counted, "doc_id", "n_bpe", PackWindow, PackBucket)
      .select("doc_id", "n_bpe", "cum_end",
        "first_window", "last_window", "n_windows")
      .orderBy("doc_id")
  }

  /** The shared CTE block: fixture merge table → per-word recursive
    * encode (`encw`) → per-(doc, position) words (`docw`). Both oracle
    * twins append their own tails, so the application semantics cannot
    * drift between them.
    */
  private val bpeCtes: String =
    s"""m AS (
       | SELECT merge_rank, ml, mr
       | FROM read_parquet('$FixtureDir/*/*.parquet')
       | WHERE corpus_docs = (SELECT count(*) FROM documents)),
       |t AS (
       | SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
       | WHERE length($normSql) > 0),
       |words AS (
       | SELECT DISTINCT word
       | FROM (SELECT unnest(toks) AS word FROM t) WHERE word <> ''),
       |base AS (
       | SELECT word,
       |  list_transform(range(1, length(word) + 1),
       |    i -> substr(word, i, 1)) AS syms,
       |  1 AS r
       | FROM words),
       |enc AS (
       | SELECT word, syms, r FROM base
       | UNION ALL
       | SELECT word,
       |  CASE WHEN p IS NULL THEN syms
       |       ELSE syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:len(syms)]
       |  END AS syms,
       |  CASE WHEN p IS NULL THEN r + 1 ELSE r END AS r
       | FROM (
       |  SELECT e.word, e.syms, e.r,
       |   nullif(list_position(list_transform(range(1, len(e.syms)),
       |     i -> e.syms[i] = m.ml AND e.syms[i+1] = m.mr), true), 0) AS p
       |  FROM enc e JOIN m ON m.merge_rank = e.r) s),
       |encw AS (
       | SELECT word, syms FROM enc
       | WHERE r = (SELECT coalesce(max(merge_rank), 0) + 1 FROM m)),
       |docw AS (
       | SELECT doc_id, u.i AS pos, toks[u.i] AS word
       | FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
       | WHERE toks[u.i] <> '')""".stripMargin

  val q69Sql: String =
    s"""WITH RECURSIVE
       |$bpeCtes
       |SELECT d.doc_id,
       | count(*) AS n_tokens,
       | CAST(sum(len(e.syms)) AS BIGINT) AS n_bpe_tokens,
       | md5(string_agg(array_to_string(e.syms, ' '), ' ' ORDER BY d.pos))
       |   AS bpe_md5
       |FROM docw d JOIN encw e USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  val q71Sql: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |nb AS (
       | SELECT d.doc_id, CAST(sum(len(e.syms)) AS BIGINT) AS n_bpe
       | FROM docw d JOIN encw e USING (word)
       | GROUP BY d.doc_id),
       |c AS (
       | SELECT doc_id, n_bpe,
       |  CAST(sum(n_bpe) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_end
       | FROM nb WHERE n_bpe > 0)
       |SELECT doc_id, n_bpe, cum_end,
       | (cum_end - n_bpe) // $PackWindow AS first_window,
       | (cum_end - 1) // $PackWindow AS last_window,
       | ((cum_end - 1) // $PackWindow - (cum_end - n_bpe) // $PackWindow + 1)
       |   AS n_windows
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q87 tokenizer fertility audit: per-doc BPE-tokens-per-word and
  // chars-per-BPE-token — the standard tokenizer-quality observables
  // (a fertility spike on a language slice means the vocabulary
  // under-serves it; token budgets and packing density both key off
  // it). Same learned merge table and map-side encoder as q69; the
  // whole query is one corpus scan, no shuffle beyond the final sort.
  def q87TokenFertility(s: SparkSession, d: String): DataFrame = {
    val merges = learnAndFixture(s, d)
    documents(s, d)
      .select(col("doc_id"), TextStats.normalize(col("text")).as("__norm"))
      .filter(length(col("__norm")) > 0)
      .select(col("doc_id"),
        (regexp_count(col("__norm"), lit(" ")) + 1).cast("long")
          .as("n_words"),
        length(translate(col("__norm"), " ", "")).cast("long")
          .as("n_chars"),
        size(Bpe.encode(col("__norm"), merges)).cast("long").as("n_bpe"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe"),
        round(col("n_bpe") / col("n_words"), 6).as("fertility"),
        round(col("n_chars") / col("n_bpe"), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  val q87Sql: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |ft AS (
       | SELECT d.doc_id,
       |  count(*) AS n_words,
       |  CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(e.syms)) AS BIGINT) AS n_bpe
       | FROM docw d JOIN encw e USING (word)
       | GROUP BY d.doc_id)
       |SELECT doc_id, n_words, n_chars, n_bpe,
       | round(n_bpe / CAST(n_words AS DOUBLE), 6) AS fertility,
       | round(n_chars / CAST(n_bpe AS DOUBLE), 6) AS chars_per_token
       |FROM ft ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_bpe_tokenize" -> (q69BpeTokenize _),
    "q71_bpe_packing" -> (q71BpePacking _),
    "q87_token_fertility" -> (q87TokenFertility _))

  val oracle: Map[String, String] = Map(
    "q69_bpe_tokenize" -> q69Sql,
    "q71_bpe_packing" -> q71Sql,
    "q87_token_fertility" -> q87Sql)
}
