package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE spelling of the index-lookup key-batch contract
  * (reference: executor/index_lookup_join.go / index_lookup_merge_
  * join.go build bounded key batches from the outer side), shared by
  * q_join_index_lookup and q_join_index_merge so the cap and the
  * degrade path cannot drift between the hash and merge variants. */
object IndexLookup {

  /** Past this many probe keys the IN pushdown stops paying (and the
    * driver-side batch stops being O(1)-defensible). */
  val KeyBatchCap = 65536

  /** Collect up to cap+1 probe keys. Some(keys) within the cap; None
    * past it — the caller degrades to the unpushed join (scanning
    * everything IS the right plan when the probe isn't selective)
    * instead of aborting, so a fixed registry entry never becomes
    * scale-factor-fragile. */
  def probeKeys(probe: DataFrame, keyCol: String,
      entry: String): Option[Seq[Long]] = {
    val rows = probe.select(keyCol).limit(KeyBatchCap + 1).collect()
    if (rows.length > KeyBatchCap) {
      System.err.println(s"$entry: probe exceeds $KeyBatchCap keys; " +
        "falling back to the unpushed join")
      None
    } else Some(rows.map(_.getLong(0)).toSeq)
  }
}
