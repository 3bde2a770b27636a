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
    * longer matches its persisted fixture. The next access re-loads
    * or re-learns and re-persists.
    */
  private[graft] def invalidate(key: String): Unit = cache.remove(key)

  // -- the OWNED fixture protocol ------------------------------------
  // Which corpus (owner tag, usually the corpus dir) last wrote each
  // fixture DIRECTORY in this JVM. Overwrite-on-learn fixtures share
  // an on-disk subdir keyed by corpus ROW COUNT, so two same-count
  // corpora collide on disk (the sf0.001/sf0.01 embeddings both hold
  // 500 vectors); the load path rejects a foreign fixture via its
  // corpus_dir provenance, but a MEMORY hit never re-reads disk — an
  // A-B-A alternation would serve A's cached artifact while the
  // external oracle reads B's overwritten fixture. The owner map
  // closes that gap at O(1): an owner mismatch invalidates the cache
  // entry, the load path rejects the foreign fixture, and the
  // re-learn restores it. Per-dir locking makes check→get→publish
  // atomic — two corpora racing their FIRST access would otherwise
  // interleave learn and owner-publish and leave the map claiming A
  // owns a dir whose fixture B wrote last (concurrent learns of one
  // dir serialize; same-dir steady-state accesses only contend on
  // the brief memory-hit critical section).
  private val owners = TrieMap.empty[String, String]
  private val ownerLocks = TrieMap.empty[String, Object]
  // Every cache key ever registered under a fixture dir. Some dirs
  // host MULTIPLE key families (sq8/sq8even, pqcoarse/pqcoarseeven):
  // an owner flip must evict ALL of them, not just the caller's key —
  // otherwise an A-B-A corpus alternation flips the owner back to A
  // via family 1 and family 2's next access sees a matching owner and
  // serves A's stale memory value against B's on-disk overwrite.
  private val dirKeys = TrieMap.empty[String, Set[String]]

  def getOrLoadOrLearnOwned[A <: AnyRef](key: String, fixtureDir: String,
      ownerTag: String)(load: => Option[A])(learn: => A): A = {
    val lock = ownerLocks.getOrElseUpdate(fixtureDir, new Object)
    lock.synchronized {
      if (!owners.get(fixtureDir).forall(_ == ownerTag))
        dirKeys.getOrElse(fixtureDir, Set.empty).foreach(cache.remove)
      dirKeys(fixtureDir) = dirKeys.getOrElse(fixtureDir, Set.empty) + key
      val v = getOrLoadOrLearn(key)(load)(learn)
      owners(fixtureDir) = ownerTag
      v
    }
  }

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
