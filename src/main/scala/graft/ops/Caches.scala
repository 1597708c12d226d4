package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared cache registry for LAZY operators that must persist an input
  * feeding both sides of a self-join (the C1 multi-branch fan-out
  * discipline: fingerprint tables in [[graft.multimodal.ImageHash]],
  * [[graft.multimodal.VideoHash]], the tar member table in
  * [[graft.sources.Tar]]).
  *
  * Those operators return a DataFrame without running it, so they cannot
  * unpersist after "the join materializes" — there is no materialization
  * point inside them (unlike [[Graph]], which iterates internally and
  * releases each round's caches itself). Instead every such persist is
  * REGISTERED here, and the session owner releases them at its natural
  * seam: the Verify/Bench harnesses call `spark.catalog.clearCache()`
  * between queries (which already drops these blocks); a library user
  * embedding many invocations in one session calls [[release]] after
  * consuming each result. Entries are idempotent to release twice —
  * `unpersist` on an already-unpersisted frame is a no-op.
  */
object Caches {

  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK — fingerprint/member tables are
    * small but must survive memory pressure without recompute, which
    * would re-run a decode pass) and register it for [[release]].
    */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.add(df)
    df
  }

  /** Unpersist every registered frame (non-blocking). Safe to call at
    * any time: frames still referenced by an unfinished plan recompute
    * instead of failing.
    */
  def release(): Unit = {
    var df = registry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = registry.poll()
    }
  }
}
