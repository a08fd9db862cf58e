package graft

import org.apache.spark.sql.functions._

/** Round-17 wave: the ALTER SEQUENCE lifecycle. */
class Wave22Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  test("Sequences store: refusal corners and the merged ALTER definition") {
    val S = graft.tools.Sequences
    S.clear()
    try {
      S.create("s1", S.SeqDef(1000L, 1L, 100L, 10999L, cycle = true))
      // Duplicate CREATE refuses (sequences share the table namespace).
      intercept[IllegalStateException](
        S.create("s1", S.SeqDef(1L, 1L, 10L, 100L, cycle = false)))
      // Unknown-name paths refuse loudly.
      intercept[IllegalStateException](S.alter("nope"))
      intercept[IllegalStateException](S.params("nope"))
      // Zero increment refuses at definition time.
      intercept[IllegalArgumentException](
        S.create("s2", S.SeqDef(1L, 0L, 10L, 100L, cycle = false)))
      // RESTART past the surviving MAXVALUE refuses on the MERGED
      // definition (maxValue not altered here, so 10999 survives).
      intercept[IllegalArgumentException](
        S.alter("s1", restartWith = Some(20000L)))
      // The refused ALTER must not have half-applied.
      assert(S.params("s1").start == 1000L)
      // Omitted clauses keep current values; cycleValues rescales
      // with the stride: (79997 - 50000) / 3 + 1 = 10000.
      val merged = S.alter("s1", restartWith = Some(50000L),
        increment = Some(3L), maxValue = Some(79997L))
      assert(merged == S.SeqDef(50000L, 3L, 100L, 79997L, cycle = true))
      assert(merged.cycleValues == 10000L)
      assert(S.render("s1") ==
        "s1:start=50000:inc=3:cache=100:max=79997:cycle")
    } finally S.clear()
  }

  test("q_alter_sequence: epoch-2 bases restart at 0 (ALTER discards " +
      "leased caches) and values carry the new stride") {
    val rows = q("q_alter_sequence").collect()
    // 2 SHOW rows + 2 epochs x 4 sessions x 6 facts.
    assert(rows.length == 2 + 2 * 4 * 6)
    def fact(stage: String, item: String): Long =
      rows.find(r => r.getString(0) == stage && r.getString(1) == item)
        .get.getLong(2)
    // Session 0 leases the FIRST block in both epochs — the epoch-2
    // base restarting at 0 is the cache-invalidation semantic (a
    // metadata-only ALTER would continue from epoch 1's high water).
    assert(fact("2_epoch1", "s0:block_base") == 0L)
    assert(fact("4_epoch2", "s0:block_base") == 0L)
    // Later sessions' epoch-2 bases are fresh leases over EPOCH-2
    // counts only: base(s) = sum over s' < s of ceil(n_s'/100)*100.
    val n0e2 = fact("4_epoch2", "s0:n_rows")
    assert(fact("4_epoch2", "s1:block_base") ==
      (n0e2 + 99L) / 100L * 100L)
    // Epoch-1 values sit in [1000, 10999] (stride 1); epoch-2 values
    // start AT the restart point and move in stride-3 steps.
    assert(fact("2_epoch1", "s0:min_seq") == 1000L)
    assert(fact("2_epoch1", "s3:max_seq") <= 10999L)
    assert(fact("4_epoch2", "s0:min_seq") == 50000L)
    val maxE2 = fact("4_epoch2", "s3:max_seq")
    assert(maxE2 <= 79997L && (maxE2 - 50000L) % 3L == 0L)
    // Gap slots are the discarded tails: 0 <= gap < cache.
    (0 to 3).foreach { s =>
      val g = fact("4_epoch2", s"s$s:gap_slots")
      assert(g >= 0L && g < 100L)
    }
    // The entry leaves the store clean.
    intercept[IllegalStateException](
      graft.tools.Sequences.params("seq_orders"))
  }
}
