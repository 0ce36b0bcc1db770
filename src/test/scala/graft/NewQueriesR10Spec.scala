package graft

import org.apache.spark.sql.functions._

/** r10 additions: m15 pack-split invariants (the DuckDB hash oracle is
  * the cross-engine replay; these are the structural properties the
  * split semantics must satisfy regardless of data).
  */
class NewQueriesR10Spec extends SparkSpec {

  test("m15 cuts exactly at 4096: every non-final bin full, stream conserved vs m14") {
    import spark.implicits._
    val m15 = SparkEntry.queries("m15_pack_split")(spark, sfDir)
      .select("modality", "bin", "n_segments", "n_split_segments",
        "bin_tokens", "fill_e4")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val m14 = SparkEntry.queries("m14_multimodal_pack")(spark, sfDir)
      .select("modality", "n_items", "bin_tokens")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    assert(m15.keySet == m14.keySet)
    for ((mod, bins) <- m15) {
      // bins contiguous from 0
      assert(bins.map(_._2).toSeq == (0L until bins.size).toSeq,
        s"$mod: bins not contiguous")
      // every bin but the last is exactly full; fill never exceeds 1
      bins.dropRight(1).foreach { b =>
        assert(b._5 == 4096L && b._6 == 10000L,
          s"$mod bin ${b._2}: non-final bin not full: $b")
      }
      assert(bins.last._5 <= 4096L && bins.last._6 <= 10000L)
      // token stream conserved: split changes segmentation, never mass
      val (items14, toks14) = m14(mod)
      assert(bins.map(_._5).sum == toks14, s"$mod: token mass changed")
      // final-bin index is determined by the total mass
      assert(bins.last._2 == (toks14 - 1) / 4096, s"$mod: wrong last bin")
      // each split item adds segments: n_segments >= n_items, and the
      // overage is bounded by the split-segment count
      val segs = bins.map(_._3).sum
      val splits = bins.map(_._4).sum
      assert(segs >= items14 && segs - items14 <= splits,
        s"$mod: segments=$segs items=$items14 splits=$splits")
    }
  }
}
