package graft

/** r12 addition: j44_store_maintenance card invariants (the DuckDB hash
  * oracle is the cross-engine replay; these pin the structural claims
  * the card makes regardless of data — in particular that the
  * `03_compacted` row, computed FROM the post-swap store read, is
  * content-identical to the pre-compact vacuumed set).
  */
class NewQueriesR12Spec extends SparkSpec {

  test("j44 maintenance card: upsert is in-place, compact is content-identical") {
    import spark.implicits._
    val card = SparkEntry.queries("j44_store_maintenance")(spark, sfDir)
      .select("stage", "n_rows", "n_groups", "checksum")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(card.map(_._1) ==
      Seq("00_raw", "01_upserted", "02_vacuumed", "03_compacted"))
    val Seq(raw, up, vac, comp) = card
    // upsert replaces in place: same keys, same groups, revised content
    assert(up._2 == raw._2 && up._3 == raw._3)
    assert(up._4 != raw._4, "revision batch must change the checksum")
    // vacuum keeps <= 2 versions per surviving group and reaps groups
    assert(vac._2 <= 2 * vac._3)
    assert(vac._2 < up._2 && vac._3 < up._3,
      "sf0.001 derives both prunable versions and tombstoned groups")
    // compact (read back from the post-swap store) is pure layout:
    // row/group/checksum identical to the vacuumed content
    assert(comp == vac.copy(_1 = "03_compacted"),
      s"compact changed content: $vac vs $comp")
  }
}
