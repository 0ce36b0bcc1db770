package graft

import org.apache.spark.sql.functions._

/** Round-8 fourth wave: j41 catalog merge, q43 equi-depth histogram,
  * d37 range search, t40 n-gram novelty. Each gets an independent plain-
  * Scala replay (or exact property) on top of the DuckDB hash gate, so a
  * candidate-generation bug that happened to fool the (identically-
  * shaped) oracle would still be caught.
  */
class NewQueriesR8bSpec extends SparkSpec {

  private def haversineKm(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val r = graft.functions.GeoFunctions.EarthRadiusKm
    val a = math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2)
    2 * r * math.asin(math.sqrt(a))
  }

  test("j41: bucket-cell association equals the all-pairs Scala replay") {
    val got = SparkEntry.queries("j41_catalog_merge")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    val evs = graft.operators.Indexers.EventIndex
      .attach(Tables.events(spark, sfDir))
      .select(col("event_id"), col("agency"),
        expr("CAST(round(magnitude * 100) AS BIGINT)").as("mag_c"),
        unix_timestamp(col("time")).as("sec"),
        col("latitude"), col("longitude"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val want = (for {
      a @ (aid, aag, amag, asec, alat, alon) <- evs
      b @ (bid, bag, bmag, bsec, blat, blon) <- evs
      if aid < bid && aag != bag && math.abs(bsec - asec) <= 1800
      dist = haversineKm(alat, alon, blat, blon)
      if dist <= 1000.0
    } yield (aid, bid) ->
      ((aag, bag, bsec - asec, math.round(dist * 100),
        math.abs(amag - bmag)))).toMap
    assert(got == want)
    assert(got.nonEmpty) // 10 pairs at sf0.001
  }

  test("q43: decile boundaries and bucket stats equal an exact integer " +
    "replay; buckets partition the table") {
    val got = SparkEntry.queries("q43_equidepth_hist")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    val prices = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    val n = prices.length
    // exact interpolated percentile ×10: pos = k(n-1) in tenths
    val bs10 = (1 to 9).map { k =>
      val pos = k.toLong * (n - 1)
      val lo = (pos / 10).toInt
      val frac = pos % 10
      prices(lo) * 10 +
        frac * (prices(math.min(lo + 1, n - 1)) - prices(lo))
    }
    val byBucket = prices.groupBy(p => 1L + bs10.count(_ < p * 10))
    val want = byBucket.map { case (b, vs) =>
      b -> ((vs.length.toLong, vs.min, vs.max, vs.sum))
    }
    assert(got == want)
    assert(got.keys.toSeq.sorted == (1L to 10L) &&
      got.values.map(_._1).sum == n.toLong)
  }

  test("d37: probed range search equals the Scala replay and is a subset " +
    "of all-pairs range search") {
    val got = SparkEntry.queries("d37_range_search")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(
        graft.operators.SimilaritySearch.quantizeSql("embedding")))
      .select("vec_id", "q")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents = vecs.filter(_._1 < 8)
    def probes(v: Array[Long], np: Int): Seq[Long] = {
      val nv = dot(v, v)
      cents.toSeq.map { case (cid, cq) =>
        (nv + dot(cq, cq) - 2 * dot(v, cq), cid)
      }.sorted.take(np).map(_._2)
    }
    val tau = 250000L
    val want = (for {
      (qid, qv) <- vecs.toSeq if qid >= 10 && qid < 20
      qLists = probes(qv, 2).toSet
      (cid, cv) <- vecs.toSeq if cid >= 20
      if qLists.contains(probes(cv, 1).head)
      d = dot(qv, cv) if d >= tau
    } yield (qid, cid) -> d).toMap
    assert(got == want)
    // subset of the unpruned range result, and every dot honors tau
    assert(got.values.forall(_ >= tau))
    val full = (for {
      (qid, qv) <- vecs.toSeq if qid >= 10 && qid < 20
      (cid, cv) <- vecs.toSeq if cid >= 20
      d = dot(qv, cv) if d >= tau
    } yield (qid, cid)).toSet
    assert(got.keySet.subsetOf(full))
  }

  test("q44: union registers are the per-register max of the set " +
    "registers, and exact audit columns obey inclusion-exclusion bounds") {
    val r = SparkEntry.queries("q44_hll_intersection")(spark, sfDir)
      .collect().head
    val (estA, estB, estU, estI) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val (exA, exB, exI) = (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(estI == estA + estB - estU)
    // union estimate can never fall below either arm's (same-register max)
    assert(estU >= estA && estU >= estB)
    assert(exI <= math.min(exA, exB) && exI >= 0)
    // independent exact replay of the audit columns
    import org.apache.spark.sql.functions._
    val items = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_type"),
        expr("user_id * 1048576 + unix_timestamp(ts) div 86400").as("k"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val a = items.collect { case ("purchase", k) => k }.toSet
    val b = items.collect { case ("signup", k) => k }.toSet
    assert((exA, exB, exI) ==
      ((a.size.toLong, b.size.toLong, (a & b).size.toLong)))
  }

  test("t41: the matrix totals d03's pair count and the replayed " +
    "source resolution matches") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("t41_source_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("d03_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nd = srcOf.values.groupBy(identity).view.mapValues(_.size.toLong)
    val want = pairs.groupBy { case (x, y) =>
      val (sx, sy) = (srcOf(x), srcOf(y))
      (if (sx <= sy) sx else sy, if (sx <= sy) sy else sx)
    }.map { case ((sa, sb), ps) =>
      val (na, nb) = (nd(sa), nd(sb))
      (sa, sb) -> ((ps.length.toLong, na, nb,
        ps.length.toLong * 1000000000L / (na * nb)))
    }
    assert(got == want)
    assert(got.values.map(_._1).sum == pairs.length.toLong)
  }

  test("d38: the post arm is a rank-aligned prefix of the pre arm and " +
    "under-fills k (the documented recall gap)") {
    val rows = SparkEntry.queries("d38_filtered_ann")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val pre = rows.filter(_._2 == "pre")
      .map(r => (r._1, r._5) -> ((r._3, r._4))).toMap
    val post = rows.filter(_._2 == "post")
    // a 'fr' doc in the global top-10 dominates every lower-dot 'fr'
    // doc, so the post arm's rank-r row must equal the pre arm's
    post.foreach { case (q, _, cand, dot, rn) =>
      assert(pre.get((q, rn)).contains((cand, dot)),
        s"post row (q=$q rn=$rn) diverges from pre")
    }
    assert(pre.size == 30) // 10 queries x k=3, filter-aware exact
    assert(post.length < 30, "post arm never under-filled - no gap shown")
  }

  test("j42: weekly Mc/b-value equals an independent Scala replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("j42_completeness_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val mags = graft.operators.Indexers.EventIndex
      .attach(Tables.events(spark, sfDir))
      .select(col("agency"), expr("unix_timestamp(time) div 604800").as("wk"),
        expr("CAST(round(magnitude * 100) AS BIGINT)").as("mag_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = mags.groupBy(m => (m._1, m._2)).map { case (key, rows) =>
      val magc = rows.map(_._3)
      val bins = magc.groupBy(_ / 10).view.mapValues(_.size)
      val mcBin = bins.toSeq.maxBy { case (bin, nb) => (nb, -bin) }._1
      val above = magc.filter(_ >= mcBin * 10)
      val bE4 = math.round(434294.4819032518 * above.size /
        (above.sum - above.size.toLong * (mcBin * 10 - 5)))
      key -> ((magc.size.toLong, mcBin * 10, above.size.toLong, bE4))
    }
    assert(got == want)
  }

  test("d39: per-label centroid drift equals an independent Scala replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("d39_centroid_drift")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(
        graft.operators.SimilaritySearch.quantizeSql("embedding")))
      .select("vec_id", "label", "q")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Long](2).toArray))
    def centroid(rows: Seq[Array[Long]]): Array[Long] = {
      val n = rows.length
      Array.tabulate(rows.head.length) { d =>
        val sx = rows.map(_(d)).sum
        (sx - ((sx % n + n) % n)) / n
      }
    }
    val want = vecs.groupBy(_._2).map { case (label, rows) =>
      val a = rows.filter(_._1 % 2 == 0).map(_._3).toSeq
      val b = rows.filter(_._1 % 2 == 1).map(_._3).toSeq
      val (ca, cb) = (centroid(a), centroid(b))
      val drift = ca.zip(cb).map { case (x, y) => (x - y) * (x - y) }.sum
      label -> ((a.size.toLong, b.size.toLong, drift,
        ca.map(x => x * x).sum))
    }
    assert(got == want)
  }

  test("t43: the confusion cells sum to the corpus and metrics derive " +
    "from the cells") {
    val r = SparkEntry.queries("t43_classifier_eval")(spark, sfDir)
      .collect().head
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (p, rec, acc) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(tp + fp + fn + tn == Tables.documents(spark, sfDir).count())
    assert(p == (if (tp + fp == 0) -1L else tp * 10000 / (tp + fp)))
    assert(rec == (if (tp + fn == 0) -1L else tp * 10000 / (tp + fn)))
    assert(acc == (tp + tn) * 10000 / (tp + fp + fn + tn))
    // teacher positives must equal t22's kept count
    val kept = SparkEntry.queries("t22_gopher_rules")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(tp + fn == kept)
  }

  test("j43: per-channel segments equal an independent Scala replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("j43_availability")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((uid, ch), rs) =>
      val secs = rs.map(_._3).sorted
      val segs = secs.tail.foldLeft(List((secs.head, secs.head))) {
        case ((s0, s1) :: rest, t) =>
          if (t - s1 > 86400) (t, t) :: (s0, s1) :: rest
          else (s0, t) :: rest
        case (Nil, t) => List((t, t))
      }
      val covered = segs.map { case (a, b) => b - a }.sum
      val (first, last) = (secs.head, secs.last)
      val cov = if (last > first) covered * 10000 / (last - first) else 10000L
      (s"N${uid % 10}", s"ST$uid", ch) ->
        ((segs.size.toLong, first, last, covered, cov))
    }
    assert(got == want)
  }

  test("t42: the funnel is monotone and each stage matches its " +
    "standalone operator") {
    import org.apache.spark.sql.functions._
    val card = SparkEntry.queries("t42_pipeline_card")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(card.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(card.map(_._2).toSeq ==
      Seq("raw", "quality", "exact", "neardup", "decontam"))
    // monotone: every stage is a subset of the previous
    card.sliding(2).foreach { case Array(p, n) =>
      assert(n._3 <= p._3 && n._4 <= p._4, s"stage ${n._2} grew")
    }
    assert(card.last._3 > 0, "decontam stage emptied the corpus")
    // stage 1-3 cross-checked against the standalone operators
    val train = Tables.documents(spark, sfDir)
      .filter(expr("NOT ((doc_id * 2654435761) % 100 < 10)"))
      .select("doc_id", "text", "n_chars")
    assert(card(0)._3 == train.count())
    // t22's per-doc verdict restricted to the train split IS the
    // quality stage (rules are per-doc, so the subset verdict agrees)
    val keepIds = SparkEntry.queries("t22_gopher_rules")(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    val q = train.join(keepIds, "doc_id")
    assert(card(1)._3 == q.count())
    assert(card(2)._3 == graft.operators.Dedup.exact(q).count())
  }

  test("m14: bins partition each modality's token mass and fills " +
    "derive from bin tokens") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("m14_multimodal_pack")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
    val byMod = got.groupBy(_._1._1)
    val mix = SparkEntry.queries("m07_modality_mix")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    byMod.foreach { case (mod, bins) =>
      val (nItems, totToks) = mix(mod)
      assert(bins.map(_._2._1).sum == nItems, s"$mod item count")
      assert(bins.map(_._2._2).sum == totToks, s"$mod token mass")
      // bin ids start at 0 and are distinct (oversized items legitimately
      // SKIP ids — a single video can span many 4096-token bins)
      val ids = bins.map(_._1._2).sorted.toSeq
      assert(ids.head == 0L && ids.distinct == ids, s"$mod bin ids")
      bins.foreach { case ((_, _), (_, toks, fill)) =>
        assert(fill == toks * 10000 / 4096)
      }
    }
  }

  test("m13: shots partition each video's frames and count cuts + 1") {
    val stats = SparkEntry.queries("m13_shot_stats")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    val cuts = SparkEntry.queries("m09_scene_cuts")(spark, sfDir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = graft.operators.Multimodal.sampleFrames(spark,
      graft.operators.Multimodal.withPayload(Tables.documents(spark, sfDir)),
      stride = 1).toDF()
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.keySet == frames.keySet)
    stats.foreach { case (id, (nShots, nFrames, longest, meanFl)) =>
      assert(nFrames == frames(id), s"doc $id frame total")
      assert(nShots == cuts.getOrElse(id, 0L) + 1, s"doc $id shots != cuts+1")
      assert(longest <= nFrames && meanFl == nFrames / nShots)
    }
  }

  test("s09: daily PSI equals an independent Scala replay and the " +
    "reference day scores zero") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("s09_psi_drift")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(expr("unix_timestamp(ts) div 86400").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val daily = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => t -> c }.toMap).toMap
    val rd = daily.keys.min
    val ref = daily(rd)
    val nr = ref.values.sum
    val want = daily.map { case (day, cs) =>
      val nd = cs.values.sum
      val psi = cs.toSeq.map { case (t, c) =>
        ref.get(t) match {
          case Some(r) if c > 0 =>
            val p = c.toDouble / nd
            val q = r.toDouble / nr
            math.round((p - q) * math.log(p / q) * 1e9)
          case _ => 0L
        }
      }.sum
      day -> ((nd, cs.size.toLong, psi))
    }
    assert(got == want)
    assert(got(rd)._3 == 0L, "reference day PSI must be exactly zero")
    assert(got.values.forall(_._3 >= 0L), "PSI is a nonnegative score")
  }

  test("t40: novelty equals the Scala replay; the first document is all-" +
    "novel and ratios are in range") {
    val got = SparkEntry.queries("t40_ngram_novelty")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ").toSeq)
    val gramSets = docs.collect {
      case (id, toks) if toks.length >= 8 =>
        id -> toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val firstDoc = gramSets.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = gramSets.map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id).toLong
      id -> ((gs.size.toLong, novel, novel * 10000 / gs.size))
    }.toMap
    assert(got == want)
    val firstId = gramSets.map(_._1).min
    assert(got(firstId)._3 == 10000L)
    assert(got.values.forall { case (t, nv, e4) =>
      nv <= t && e4 >= 0 && e4 <= 10000 })
  }
}
