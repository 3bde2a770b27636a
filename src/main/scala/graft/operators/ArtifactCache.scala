package graft.operators

import scala.collection.concurrent.TrieMap

/** In-process registry for LEARNED artifacts — BPE merge tables, PQ
  * codebooks: values that are deterministic, immutable functions of
  * (corpus, hyperparameters).
  *
  * The model-registry pattern: a deployment learns such an artifact
  * once and persists it (a model table next to the data); every
  * serving query then pays only the apply cost. Re-learning inside
  * each query charges the full training loop to every consumer — at
  * 100 TB that is the difference between one corpus pass ever and one
  * per query. This cache is the single-JVM stand-in for that
  * persisted registry: keyed by (corpus location, hyperparameters),
  * so different scale factors or parameter choices never collide, and
  * safe BECAUSE learning is deterministic — a cache hit returns
  * byte-identical content to a re-learn (BpeSpec /
  * ExtensionOperatorsSpec pin the determinism).
  *
  * Deliberately unbounded and never invalidated: artifacts are tiny
  * (dozens of merge rows, m·K centroid rows) and immutable for a
  * given key; a corpus REWRITTEN in place under the same path is the
  * one case that would need invalidation, which the driver harness
  * never does (and a deployment versions its corpus paths).
  */
private[graft] object ArtifactCache {

  private val cache = TrieMap.empty[String, AnyRef]

  private val learns = new java.util.concurrent.atomic.AtomicInteger(0)

  // per-key wall seconds of learn bodies / fixture loads actually run
  // in this JVM — the bench harness reports them so rounds can track
  // learning-path regressions separately from serving cost
  private val learnWall = TrieMap.empty[String, Double]
  private val loadWall = TrieMap.empty[String, Double]

  /** Return the cached artifact for `key`, learning it (and running
    * any side effects inside `learn`, e.g. the oracle fixture write)
    * exactly once per key per JVM. Concurrent first callers may race
    * the learn; determinism makes the duplicate work harmless and the
    * last write wins with identical content.
    */
  def getOrLearn[A <: AnyRef](key: String)(learn: => A): A =
    getOrLoadOrLearn(key)(None)(learn)

  /** The full registry protocol: memory hit → persisted-fixture LOAD →
    * learn. `load` is the cross-JVM read path — when a prior run
    * (this JVM or another) already persisted the artifact, loading it
    * skips every learning job (a cold single-query driver run stops
    * paying the train loop). Safe because artifacts are DETERMINISTIC
    * functions of (corpus, hyperparameters): load ≡ learn, which the
    * registry spec pins by comparing both paths' values.
    */
  def getOrLoadOrLearn[A <: AnyRef](key: String)(load: => Option[A])
                                   (learn: => A): A =
    cache.getOrElseUpdate(key, {
      val t0 = System.nanoTime()
      load match {
        case Some(v) =>
          loadWall(key) = (System.nanoTime() - t0) / 1e9
          v
        case None =>
          learns.incrementAndGet()
          val t1 = System.nanoTime()
          val v = learn
          learnWall(key) = (System.nanoTime() - t1) / 1e9
          v
      }
    }).asInstanceOf[A]

  /** Parquet fixture read half: Some(frame) when `path` exists. The
    * caller turns rows back into its artifact type (and re-validates
    * any corpus-size column it stored).
    */
  def parquetFixture(spark: org.apache.spark.sql.SparkSession,
                     path: String): Option[org.apache.spark.sql.DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val exists = p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    if (exists) Some(spark.read.parquet(path)) else None
  }

  /** How many times a `learn` body actually executed in this JVM —
    * the registry spec's observable (a fixture-served call must not
    * move it).
    */
  private[graft] def learnCount: Int = learns.get()

  /** Wall seconds per artifact actually learned / loaded this JVM. */
  private[graft] def learnTimes: Map[String, Double] = learnWall.toMap
  private[graft] def loadTimes: Map[String, Double] = loadWall.toMap

  /** Drop one key — for callers that can PROVE the cached value no
    * longer matches its persisted fixture (e.g. another corpus with
    * the same row count overwrote the fixture path in this JVM — the
    * A-B-A case the owner-map in Queries tracks). The next access
    * re-loads or re-learns and re-persists.
    */
  private[graft] def invalidate(key: String): Unit = cache.remove(key)

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
