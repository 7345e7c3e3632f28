package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 pipeline additions (q73–q78) —
  * properties beyond the DuckDB hash compare (attribution bounds,
  * multi-probe structure, decontamination side conditions, LM count
  * consistency, quantization error bounds).
  */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q124 power-iteration step matches an independent fixed-point recomputation") {
    def rnd(x: Double, scale: Int): Double =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf).embeddings
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    // exact mirror of the query: per-row left-to-right double fold, per-
    // dimension e6 quantization BEFORE the cross-row (integer) sum
    val u = new Array[Long](dims)
    vecs.foreach { v =>
      var s = 0.0
      v.foreach(x => s += x.toDouble)
      var d = 0
      while (d < dims) {
        u(d) += BigDecimal(v(d).toDouble * s * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        d += 1
      }
    }
    val tot = u.map(math.abs).sum
    val expected = u.zipWithIndex
      .map { case (acc, i) => ((i + 1).toLong, acc, rnd(acc.toDouble / tot, 6)) }.toSeq
    val got = SparkEntry.queries("q124_power_iter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // the direction is a unit-free readout: shares sum to ±1-ish L1 mass
    assert(math.abs(got.map(g => math.abs(g._3)).sum - 1.0) < 1e-3)
  }

  test("q125 activity streaks match an independent gaps-and-islands recomputation") {
    val days = Tables(spark, sf).events
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val streaks = days.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      // run lengths of consecutive epoch days
      sorted.foldLeft(List.empty[(Int, Long)]) {
        case ((last, len) :: rest, d) if d == last + 1 => (d, len + 1) :: rest
        case (acc, d)                                  => (d, 1L) :: acc
      }.map { case (_, len) => (u, len) }
    }
    val expected = streaks.groupBy(_._2).map { case (len, xs) =>
      (len, xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.toSet
    val got = SparkEntry.queries("q125_activity_streaks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // conservation: streak lengths weighted by count cover every active day
    val totalDays = got.toSeq.map(g => g._1 * g._2).sum
    assert(totalDays == days.length.toLong)
  }

  test("q132 PQ assignment matches a scalar nearest-codeword recomputation") {
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def e6(v: Array[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val knuth = vecs.map { case (id, _) => id -> ((id % 2147483647L) * 2654435761L) % 4294967296L }.toMap
    for ((m, k) <- Seq((4, 8), (8, 4))) {
      spark.conf.set("graft.pq.m", m.toString)
      spark.conf.set("graft.pq.k", k.toString)
      try {
        val sub = 64 / m
        val codebook = vecs.sortBy { case (id, _) => (knuth(id), id) }.take(k)
          .map { case (id, v) => id -> e6(v) }
        // per (vec, subspace): nearest codeword, ties to the smaller cw id
        val assigns = vecs.flatMap { case (_, v) =>
          val q = e6(v)
          (0 until m).map { s =>
            val vsub = q.slice(s * sub, (s + 1) * sub)
            val (cw, dist) = codebook.map { case (cid, cv) =>
              val csub = cv.slice(s * sub, (s + 1) * sub)
              (cid, vsub.zip(csub).map { case (a, b) => (a - b) * (a - b) }.sum)
            }.minBy { case (cid, d) => (d, cid) }
            (s.toLong, cw, dist)
          }
        }
        val expected = assigns.groupBy(a => (a._1, a._2)).map { case ((s, cw), xs) =>
          (s, cw, xs.size.toLong,
            BigDecimal(xs.map(_._3).sum.toDouble / xs.size / 1e12)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toSet
        val got = SparkEntry.queries("q132_pq_quantize")(spark, sf).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        assert(got == expected, s"m=$m k=$k")
        // every vector is assigned exactly once per subspace
        assert(got.toSeq.groupBy(_._1).forall(_._2.map(_._3).sum == vecs.length.toLong))
      } finally { spark.conf.unset("graft.pq.m"); spark.conf.unset("graft.pq.k") }
    }
  }

  test("q211 PQ recall matches a scalar ADC-vs-exact recomputation") {
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def e6(v: Array[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val (m, k, sub, topK) = (4, 8, 16, 10)
    val knuth = vecs.map { case (id, _) => id -> ((id % 2147483647L) * 2654435761L) % 4294967296L }.toMap
    val codebook = vecs.sortBy { case (id, _) => (knuth(id), id) }.take(k)
      .map { case (id, v) => id -> e6(v) }
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q6 = vecs.map { case (id, v) => id -> e6(v) }.toMap
    // per (vec, subspace): the assigned codeword (ties to smaller cw)
    val assigns = vecs.map { case (id, _) =>
      id -> (0 until m).map { s =>
        codebook.map { case (cid, cv) =>
          (cid, sq(q6(id).slice(s * sub, (s + 1) * sub), cv.slice(s * sub, (s + 1) * sub)))
        }.minBy { case (cid, d) => (d, cid) }._1
      }
    }.toMap
    val cbMap = codebook.toMap
    val qids = vecs.map(_._1).filter(_ < 10).sorted
    val expected = qids.map { qid =>
      val qv = q6(qid)
      val others = vecs.map(_._1).filter(_ != qid)
      val truth = others.map(id => (id, sq(q6(id), qv)))
        .sortBy { case (id, d) => (d, id) }.take(topK).map(_._1).toSet
      val truthNn = others.map(id => (id, sq(q6(id), qv)))
        .minBy { case (id, d) => (d, id) }._1
      val adcTop = others.map { id =>
        val d = (0 until m).map { s =>
          sq(qv.slice(s * sub, (s + 1) * sub),
            cbMap(assigns(id)(s)).slice(s * sub, (s + 1) * sub))
        }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(topK).map(_._1).toSet
      val hits = adcTop.count(truth).toLong
      (qid, hits, hdiv(10000L * hits, topK.toLong),
        if (adcTop(truthNn)) 1L else 0L)
    }.toSeq
    val got = SparkEntry.queries("q211_pq_recall")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // recall is a top-10 share; an nn hit implies at least one hit
    got.foreach { case (qid, h, rec, nn) =>
      assert(h >= 0L && h <= 10L && rec == hdiv(10000L * h, 10L), qid)
      assert(nn == 0L || h >= 1L, qid)
    }
  }

  test("q247 RRF fusion matches a scalar two-ranker recomputation") {
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def e6(v: Array[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val (m, k, sub) = (4, 8, 16)
    val (bits, projs, dim) = (8, 2, 64)
    val knuth = vecs.map { case (id, _) => id -> ((id % 2147483647L) * 2654435761L) % 4294967296L }.toMap
    val codebook = vecs.sortBy { case (id, _) => (knuth(id), id) }.take(k)
      .map { case (id, v) => id -> e6(v) }
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q6 = vecs.map { case (id, v) => id -> e6(v) }.toMap
    val cbMap = codebook.toMap
    val assigns = vecs.map { case (id, _) =>
      id -> (0 until m).map { s =>
        codebook.map { case (cid, cv) =>
          (cid, sq(q6(id).slice(s * sub, (s + 1) * sub), cv.slice(s * sub, (s + 1) * sub)))
        }.minBy { case (cid, d) => (d, cid) }._1
      }
    }.toMap
    // q226's axis-aligned sign sketch: bit i of projection p reads dim
    // (p·bits + i) mod 64, set when the coordinate is ≥ 0
    def sketch(v: Array[Float]): Long =
      (0 until projs).map { p =>
        (0 until bits).map { i =>
          if (v((p * bits + i) % dim) >= 0) 1L << (bits - 1 - i) else 0L
        }.sum << ((projs - 1 - p) * bits)
      }.sum
    val sk = vecs.map { case (id, v) => id -> sketch(v) }.toMap
    def rrfTerm(r: Int): Long = (2L * 1000000L + (60L + r)) / (2L * (60L + r))
    val qids = vecs.map(_._1).filter(_ < 10).sorted
    val expected = qids.map { qid =>
      val others = vecs.map(_._1).filter(_ != qid)
      val truth = others.map(id => (id, sq(q6(id), q6(qid))))
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      val la = others.map(id => (id, java.lang.Long.bitCount(sk(id) ^ sk(qid))))
        .sortBy { case (id, h) => (h, id) }.take(50).map(_._1).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      val lb = others.map { id =>
        val d = (0 until m).map { s =>
          sq(q6(qid).slice(s * sub, (s + 1) * sub),
            cbMap(assigns(id)(s)).slice(s * sub, (s + 1) * sub))
        }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(50).map(_._1).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      val union = la.keySet ++ lb.keySet
      val fusedTop = union.toSeq
        .map(id => (id, la.get(id).map(rrfTerm).getOrElse(0L) + lb.get(id).map(rrfTerm).getOrElse(0L)))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      def hits(top: Iterable[Long]): Long = top.count(truth).toLong
      (qid, union.size.toLong, (la.keySet & lb.keySet).size.toLong,
        hits(la.filter(_._2 <= 10).keys), hits(lb.filter(_._2 <= 10).keys), hits(fusedTop))
    }.toSeq
    val got = SparkEntry.queries("q247_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    // union never exceeds the two list budgets, overlap is its complement
    got.foreach { case (qid, u, o, ha, hb, hr) =>
      assert(u + o == 100L, s"qid $qid: union $u + overlap $o != 2L")
      assert(ha <= 10L && hb <= 10L && hr <= 10L, qid)
    }
  }

  test("q228 ADC calibration matches a scalar footrule/bias recomputation") {
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def e6(v: Array[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val (m, k, sub) = (4, 8, 16)
    val knuth = vecs.map { case (id, _) => id -> ((id % 2147483647L) * 2654435761L) % 4294967296L }.toMap
    val codebook = vecs.sortBy { case (id, _) => (knuth(id), id) }.take(k)
      .map { case (id, v) => id -> e6(v) }
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q6 = vecs.map { case (id, v) => id -> e6(v) }.toMap
    val assigns = vecs.map { case (id, _) =>
      id -> (0 until m).map { s =>
        codebook.map { case (cid, cv) =>
          (cid, sq(q6(id).slice(s * sub, (s + 1) * sub), cv.slice(s * sub, (s + 1) * sub)))
        }.minBy { case (cid, d) => (d, cid) }._1
      }
    }.toMap
    val cbMap = codebook.toMap
    def shd(a: BigInt, b: BigInt): Long = {
      val q = (2 * a.abs + b) / (2 * b); (if (a < 0) -q else q).toLong
    }
    val expected = vecs.map(_._1).filter(_ < 10).sorted.map { qid =>
      val qv = q6(qid)
      val others = vecs.map(_._1).filter(_ != qid)
      val pairs = others.map { id =>
        val adc = (0 until m).map { s =>
          sq(qv.slice(s * sub, (s + 1) * sub),
            cbMap(assigns(id)(s)).slice(s * sub, (s + 1) * sub))
        }.sum
        (id, adc, sq(q6(id), qv))
      }
      val prk = pairs.sortBy(p => (p._2, p._1)).zipWithIndex
        .map { case (p, i) => p._1 -> (i + 1L) }.toMap
      val trk = pairs.sortBy(p => (p._3, p._1)).zipWithIndex
        .map { case (p, i) => p._1 -> (i + 1L) }.toMap
      val n = pairs.length.toLong
      val foot = pairs.map(p => math.abs(prk(p._1) - trk(p._1))).sum
      val maxF = n * n / 2
      val sAdc = pairs.map(p => BigInt(p._2)).sum
      val sTrue = pairs.map(p => BigInt(p._3)).sum
      (qid, n, hdiv(10000L * foot, maxF), shd(10000 * (sAdc - sTrue), sTrue))
    }.toSeq
    val got = SparkEntry.queries("q228_adc_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the audit must have something to say on this codebook: disorder
    // strictly between 0 and the maximum, bias non-zero somewhere
    got.foreach { case (qid, _, f, _) => assert(f > 0 && f < 10000, qid) }
    assert(got.exists(_._4 != 0L), "degenerate: zero bias everywhere")
  }

  test("q133 concentration matches a scalar ntile recomputation and bounds") {
    val evs = Tables(spark, sf).events
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (tpe, xs) =>
      val perUser = xs.groupBy(_._2).map { case (u, es) => (u, es.size.toLong) }.toSeq
        .sortBy { case (u, n) => (-n, u) }
      // SQL ntile: first (users % 10) tiles get one extra row
      val nUsers = perUser.size
      val tile1 = nUsers / 10 + (if (nUsers % 10 > 0) 1 else 0)
      val topN = perUser.take(tile1).map(_._2).sum
      val total = xs.size.toLong
      (tpe, total, nUsers.toLong, topN,
        BigDecimal(topN.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q133_user_concentration")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == expected)
    // the top decile can never hold less than its proportional share
    got.foreach { case (tpe, _, nu, _, share) =>
      assert(share >= 1.0 / nu - 1e-9, s"$tpe top-decile share below uniform floor") }
  }

  test("q134 idle gaps match a scalar lag recomputation with exact percentiles") {
    def pctl(sorted: Seq[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo).toDouble
    }
    def rnd2(x: Double): Double =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._4))
      sorted.zip(sorted.tail).map { case (prev, cur) => (cur._2, cur._3 - prev._3) }
    }
    val expected = gaps.groupBy(_._1).map { case (tpe, xs) =>
      val g = xs.map(_._2).sorted
      (tpe, g.size.toLong, rnd2(pctl(g, 0.5) / 1e6), rnd2(pctl(g, 0.95) / 1e6),
        rnd2(g.last / 1e6))
    }.toSet
    val got = SparkEntry.queries("q134_event_gaps")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == expected)
    // gap count conservation: every event except each user's first emits one gap
    val nUsers = evs.map(_._1).distinct.length
    assert(got.toSeq.map(_._2).sum == (evs.length - nUsers).toLong)
  }

  test("stream-join attribution only pairs users with both event kinds") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q73_stream_join")(spark, sf).collect()
    val withClicks = t.events
      .filter(col("event_type") === "click")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val withPurch = t.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(withClicks(u) && withPurch(u), s"user $u lacks a click or purchase")
      assert(r.getAs[Long]("n_pairs") >= r.getAs[Long]("n_purchases"))
    }
  }

  test("q217 unattributed clicks match an independent window recomputation") {
    val t = Tables(spark, sf)
    val evs = t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicks = evs.filter(_._2 == "click")
    val purch = evs.filter(_._2 == "purchase").groupBy(_._1)
    def hdiv2(num: Long, den: Long) = (2 * num + den) / (2 * den)
    val expected = clicks.groupBy(_._1).map { case (u, cs) =>
      val ps = purch.getOrElse(u, Array.empty[(Long, String, Long)]).map(_._3)
      val un = cs.count(c => !ps.exists(p => p >= c._3 && p <= c._3 + 1800L * 1000000L)).toLong
      (u, cs.length.toLong, un, hdiv2(10000L * un, cs.length.toLong))
    }.toSet
    val got = SparkEntry.queries("q217_unattributed_clicks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // complement ties to q73: a user below 100% unattribution has at
    // least one attributed click, so must appear in q73's pair table
    val attributedUsers = got.filter(r => r._3 < r._2).map(_._1)
    val q73Users = SparkEntry.queries("q73_stream_join")(spark, sf).collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(attributedUsers.subsetOf(q73Users))
    assert(attributedUsers.nonEmpty, "degenerate: no attributed clicks at all")
    assert(got.exists(r => r._3 > 0), "degenerate: every click attributed")
  }

  test("q218 cube emits all four grouping sets with conserved totals") {
    val t = Tables(spark, sf)
    val orders = t.orders
      .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val cells = orders.groupBy(o => (o._1, o._2))
      .map { case ((s, p), xs) => (0L, s, p, xs.length.toLong, xs.map(_._3).sum) }
    val byStatus = orders.groupBy(_._1)
      .map { case (s, xs) => (1L, s, "ALL", xs.length.toLong, xs.map(_._3).sum) }
    val byPriority = orders.groupBy(_._2)
      .map { case (p, xs) => (2L, "ALL", p, xs.length.toLong, xs.map(_._3).sum) }
    val total = Seq((3L, "ALL", "ALL", orders.length.toLong, orders.map(_._3).sum))
    val expected = (cells ++ byStatus ++ byPriority ++ total).toSet
    val got = SparkEntry.queries("q218_cube_sales")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // each grouping set's order count must conserve the corpus
    // (.toSeq first: mapping a Set to the count column would collapse
    // cells that happen to share a count — the Set-multiplicity trap)
    Seq(0L, 1L, 2L, 3L).foreach { g =>
      assert(got.toSeq.filter(_._1 == g).map(_._4).sum == orders.length.toLong, s"gid $g")
    }
  }

  test("q219 unpivot long form matches a direct per-measure recomputation") {
    val t = Tables(spark, sf)
    val rows = t.lineitem
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .collect()
    def e2(d: Double) = math.floor(d * 100 + 0.5).toLong
    val measures = Seq(
      "l_quantity" -> rows.map(r => e2(r.getDouble(0))),
      "l_extendedprice" -> rows.map(r => e2(r.getDouble(1))),
      "l_discount" -> rows.map(r => e2(r.getDouble(2))),
      "l_tax" -> rows.map(r => e2(r.getDouble(3))))
    val expected = measures.map { case (m, vs) =>
      (m, vs.length.toLong, vs.sum, vs.min, vs.max)
    }.toSet
    val got = SparkEntry.queries("q219_fact_unpivot")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // the melt must conserve the fact table: every metric carries one
    // value per lineitem row
    got.foreach { case (m, n, _, _, _) => assert(n == rows.length.toLong, m) }
  }

  test("multi-probe IVF returns ranked neighbors from at most two cells") {
    val rows = SparkEntry.queries("q74_ivf_multiprobe")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("nn_rank"))
      assert(ranked.map(_.getAs[Int]("nn_rank")).toSeq == (1 to ranked.length))
      // similarity non-increasing in rank
      val sims = ranked.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(rs.map(_.getAs[Int]("probe_rank")).forall(pr => pr == 1 || pr == 2))
      // at most two distinct cells probed
      assert(rs.map(_.getAs[Number]("label").longValue).distinct.length <= 2)
    }
  }

  test("multi-probe recall is at least single-cell recall vs brute force") {
    def neighbors(q: String): Map[Long, Set[Long]] =
      SparkEntry.queries(q)(spark, sf).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (k, rs) => k -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val brute = neighbors("q40_cosine_topk")
    val multi = neighbors("q74_ivf_multiprobe")
    val single = neighbors("q43_ivf_search")
    val (mHits, sHits) = brute.keys.toSeq.map { q =>
      val b = brute(q)
      ((multi.getOrElse(q, Set.empty) & b).size, (single.getOrElse(q, Set.empty) & b).size)
    }.unzip
    assert(mHits.sum >= sHits.sum, s"multi-probe recall ${mHits.sum} < single ${sHits.sum}")
  }

  test("trainIvf: Lloyd iterates 3+ rounds from a scrambled start to a fixed point that feeds the q74 search unchanged") {
    val t = Tables(spark, sf)
    // deliberately scrambled initialization — far from the stored labels,
    // so convergence must take several genuine reassignment rounds
    val k = t.embeddings.select(col("label")).distinct().count()
    val scrambled = t.embeddings.select(
      col("vec_id"), pmod(col("vec_id") * 31 + 7, lit(k)).cast("int").as("label"))
    val model = operators.Similarity.trainIvf(t, maxRounds = 25, init = Some(scrambled))

    // converged (last round moved nothing) after ≥3 substantive rounds
    assert(model.movedPerRound.last == 0L,
      s"did not converge in 25 rounds: ${model.movedPerRound}")
    assert(model.rounds >= 3, s"expected ≥3 rounds, trace: ${model.movedPerRound}")
    assert(model.movedPerRound.init.forall(_ > 0L), "converged rounds must terminate the loop")

    // a genuine fixed point: one more Lloyd step moves nothing
    val ev = operators.Similarity.quantizedEv(t)
    val extra = operators.Similarity.lloydStep(ev, model.assign)
      .filter(col("old_label") =!= col("new_label")).count()
    assert(extra == 0L, "assignment is not a Lloyd fixed point")

    // the trained assignment is total and centroid table has q43/q74's shape
    assert(model.assign.count() == t.embeddings.count())
    assert(model.centroids.columns.toSeq == Seq("clabel", "cdim", "sq", "cnt"))

    // and it feeds the q74 search UNCHANGED: same code path, trained labels
    val rows = operators.Similarity.ivfSearch(t, relabel = Some(model.assign)).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("nn_rank"))
      assert(ranked.map(_.getAs[Int]("nn_rank")).toSeq == (1 to ranked.length))
      assert(rs.map(_.getAs[Int]("probe_rank")).forall(pr => pr == 1 || pr == 2))
    }
  }

  test("line dedup conserves lines: kept canonicals equal the corpus's distinct lines") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q89_line_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (nLines, nRemoved, nCanonical) = rows.foldLeft((0L, 0L, 0L)) { case ((a, b, c), r) =>
      (a + r.getAs[Long]("n_lines"), b + r.getAs[Long]("n_removed"), c + r.getAs[Long]("n_canonical"))
    }
    // a dedup pass keeps exactly one copy per distinct line, corpus-wide
    val distinctLines = t.documents
      .select(explode(expr(
        """transform(sequence(0, size(split(text, ' ')) div 6 - 1),
          |  i -> array_join(slice(split(text, ' '), i * 6 + 1, 6), ' '))""".stripMargin)).as("line"))
      .distinct().count()
    assert(nLines - nRemoved == distinctLines,
      s"kept ${nLines - nRemoved} != distinct $distinctLines")
    assert(nCanonical == distinctLines, "one canonical (doc, line) group per distinct line")
    assert(nRemoved > 0, "this corpus has repeated lines; the operator must find them")
  }

  test("decontamination never reports an eval doc as a train doc") {
    val rows = SparkEntry.queries("q75_decontaminate")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("train_doc") % 97 != 0, "eval doc leaked into the train side")
      assert(r.getAs[Long]("eval_doc") % 97 == 0)
      assert(r.getAs[Long]("n_shared") >= 2)
    }
  }

  test("heavy hitters are the true top tokens with a stable tie order") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q76_heavy_hitters")(spark, sf).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "not sorted by count")
    val total = t.documents
      .select(explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") =!= "").count()
    assert(counts.sum <= total)
  }

  test("bigram counts are internally consistent (n_w1 = sum over kept+dropped)") {
    val rows = SparkEntry.queries("q77_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("w1")).foreach { case (_, rs) =>
      val nW1 = rs.map(_.getAs[Long]("n_w1")).distinct
      assert(nW1.length == 1, "n_w1 differs within one w1 group")
      assert(rs.map(_.getAs[Long]("n_bigram")).sum <= nW1.head)
    }
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p > 0.0 && p <= 1.0)
    }
  }

  test("dedup report partitions every document into exactly one bucket") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q79_dedup_report")(spark, sf).collect()
    val totals = rows.map { r =>
      val n = r.getAs[Long]("n_docs")
      assert(
        n == r.getAs[Long]("n_exact_drop") + r.getAs[Long]("n_near_drop") + r.getAs[Long]("n_keep"),
        s"buckets don't partition in ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_keep") >= 1, "a source lost every document")
      n
    }
    assert(totals.sum == t.documents.count(), "report covers the whole corpus")
  }

  test("sequence packing conserves tokens and fills bins") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q80_seq_pack")(spark, sf).collect()
    val expected = t.documents
      .select(greatest(graft.functions.GraftFunctions.subword_count(col("text")), lit(1L)).as("toks"))
      .agg(sum(col("toks"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("total_tokens")).sum == expected, "tokens lost in packing")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bins") >= 1 && r.getAs[Long]("max_docs_per_bin") >= 1)
      assert(r.getAs[Double]("fill_ratio") > 0.0)
    }
  }

  test("repetition ratios are valid proportions") {
    val rows = SparkEntry.queries("q81_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_rep_ratio")
      assert(avg >= 0.0 && avg < 1.0)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
  }

  test("modality triage covers every asset and prices audio by bytes") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q82_modality_split")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_assets")).sum == t.documents.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cost") > 0)
      if (r.getAs[String]("media_type") == "audio")
        assert(r.getAs[Long]("total_cost") == r.getAs[Long]("total_bytes"))
    }
  }

  test("late-data accounting conserves events and splits them exactly") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q83_late_data")(spark, sf).collect()
    rows.foreach { r =>
      assert(
        r.getAs[Long]("n_events") == r.getAs[Long]("n_late") + r.getAs[Long]("n_on_time"))
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum == t.events.count())
  }

  test("quality gate reasons partition the corpus and agree with q33 keeps") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q84_quality_gate")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    val valid = Set("too_short", "repetitive", "low_quality", "kept")
    rows.foreach(r => assert(valid(r.getAs[String]("reason"))))
    // gate keeps can never exceed q33's keeps (the gate adds more rules)
    val gateKept = rows.filter(_.getAs[String]("reason") == "kept")
      .map(_.getAs[Long]("n_docs")).sum
    val q33Kept = SparkEntry.queries("q33_quality_score")(spark, sf).collect()
      .map(_.getAs[Long]("n_keep")).sum
    assert(gateKept <= q33Kept)
  }

  test("minhash estimator calibration is a valid, informative audit") {
    val rows = SparkEntry.queries("q86_minhash_estimate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0 && j >= 0.0 && j <= 1.0)
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - j)) < 1e-3)
    }
    // the estimator must carry signal: mean error well below chance
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.4, f"mean |est - jaccard| = $meanErr%.3f")
  }

  test("int8 quantization error is bounded by the step size") {
    val rows = SparkEntry.queries("q78_embedding_quantize")(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val span = r.getAs[Long]("mx") - r.getAs[Long]("mn")
      val step = span / 255 + 1 // integer floor step upper bound
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("total_abs_err") <= n * step, s"dim ${r.getAs[Int]("dim")}")
    }
  }

  test("graft.lsh.bands re-tunes the minhash family at runtime") {
    def withBands[A](n: Int)(f: => A): A = {
      spark.conf.set("graft.lsh.bands", n.toString)
      try f finally spark.conf.unset("graft.lsh.bands")
    }
    // q36's widened schema follows the conf
    assert(withBands(4) {
      SparkEntry.queries("q36_minhash_sigs")(spark, sf).columns.count(_.startsWith("sig_"))
    } == 4)
    // band hashes depend only on the band index, so bands=16 evaluates a
    // superset of bands=8's buckets → candidate pairs are a superset
    def pairs(n: Int): Set[(Long, Long)] = withBands(n) {
      SparkEntry.queries("q37_lsh_pairs")(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    }
    val (p8, p16) = (pairs(8), pairs(16))
    assert(p8.subsetOf(p16), s"lost pairs at 16 bands: ${(p8 -- p16).take(3)}")
  }

  test("q42 sign-LSH is runtime-tunable and projections/bits behave monotonically") {
    def run(bits: Int, projs: Int): Array[org.apache.spark.sql.Row] = {
      spark.conf.set("graft.ann.signBits", bits.toString)
      spark.conf.set("graft.ann.signProjections", projs.toString)
      try SparkEntry.queries("q42_ann_sign_lsh")(spark, sf).collect()
      finally {
        spark.conf.unset("graft.ann.signBits")
        spark.conf.unset("graft.ann.signProjections")
      }
    }
    def pairs(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def bestSim(rows: Array[org.apache.spark.sql.Row]): Map[Long, Double] =
      rows.filter(_.getAs[Int]("nn_rank") == 1)
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cos_sim")).toMap
    val k1 = run(8, 1)
    val k2 = run(8, 2) // conf default — must match the oracle family
    // unioning a second projection can only add candidates, so each query's
    // rank-1 similarity is non-decreasing and no query disappears
    assert(pairs(k2).nonEmpty && bestSim(k1).keySet.subsetOf(bestSim(k2).keySet))
    bestSim(k1).foreach { case (q, s1) => assert(bestSim(k2)(q) >= s1 - 1e-9, s"query $q") }
    // the same coordinate window at fewer bits is a coarser partition of the
    // same projection, so its candidate pool is a superset: rank-1 quality
    // at 4 bits dominates 8 bits for the shared queries (K=1)
    val c4 = run(4, 1)
    bestSim(k1).foreach { case (q, s8) => assert(bestSim(c4)(q) >= s8 - 1e-9, s"query $q") }
    // a non-default config that changes the bucket family entirely still runs
    assert(run(12, 3).nonEmpty)
  }

  test("q101 semdedup matches an independent within-cluster recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    def cos(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def expected(tau: Double) = vecs.groupBy(_._2).map { case (label, vs) =>
      val sorted = vs.sortBy(_._1)
      val pairs = for {
        (ia, _, va) <- sorted; (ib, _, vb) <- sorted if ia < ib
        c = rnd6(cos(va, vb)) if c >= tau
      } yield (ia, ib, c)
      (label, vs.size.toLong, pairs.size.toLong,
        pairs.map(_._2).distinct.size.toLong,
        vs.size.toLong - pairs.map(_._2).distinct.size.toLong,
        if (pairs.isEmpty) 0.0 else pairs.map(_._3).max)
    }.toSet
    def got() = SparkEntry.queries("q101_semdedup")(spark, sf).collect().map { r =>
      (r.getAs[Number]("label").intValue, r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_dup_pairs"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_kept"), r.getAs[Double]("max_sim"))
    }.toSet
    assert(got() == expected(0.25))
    // tighter threshold retunes at runtime, no recompile
    spark.conf.set("graft.semdedup.tau", "0.35")
    try assert(got() == expected(0.35))
    finally spark.conf.unset("graft.semdedup.tau")
  }

  test("q137 semantic decontamination matches a scalar recomputation and retunes tau") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    def cos(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def expected(tau: Double) = vecs.groupBy(_._2).map { case (label, vs) =>
      val (ev, tr) = vs.partition(_._1 % 97 == 0)
      val hits = for {
        (tid, _, tv) <- tr; (_, _, evv) <- ev
        c = rnd6(cos(tv, evv)) if c >= tau
      } yield (tid, c)
      (label, ev.size.toLong, tr.size.toLong,
        hits.map(_._1).distinct.size.toLong, hits.size.toLong,
        if (hits.isEmpty) 0.0 else hits.map(_._2).max)
    }.toSet
    def got() = SparkEntry.queries("q137_semantic_decon")(spark, sf).collect().map { r =>
      (r.getAs[Number]("label").intValue, r.getAs[Long]("n_eval"), r.getAs[Long]("n_train"),
        r.getAs[Long]("n_contaminated"), r.getAs[Long]("n_hit_pairs"),
        r.getAs[Double]("max_sim"))
    }.toSet
    assert(got() == expected(0.25))
    assert(got().exists(_._4 > 0), "the corpus should surface some contamination at 0.25")
    spark.conf.set("graft.decon.tau", "0.5")
    try assert(got() == expected(0.5))
    finally spark.conf.unset("graft.decon.tau")
  }

  test("q138 volume anomalies match a scalar z-score recomputation") {
    def rnd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables(spark, sf).events
      .select(col("event_type"), to_date(col("ts")).cast("string").as("day")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = evs.groupBy(_._1).flatMap { case (tpe, xs) =>
      val daily = xs.groupBy(_._2).map { case (d, es) => (d, es.size.toLong) }.toSeq
      val mu = daily.map(_._2).sum.toDouble / daily.size
      val sd =
        if (daily.size < 2) None
        else {
          val v = daily.map(d => (d._2 - mu) * (d._2 - mu)).sum / (daily.size - 1)
          Some(math.sqrt(v)).filter(_ > 0)
        }
      daily.map { case (d, n) =>
        val z = sd.map(s => rnd((n - mu) / s, 4))
        (tpe, d, n, rnd(mu, 2), z, z.exists(v => math.abs(v) >= 2.0))
      }
    }.toSet
    val got = SparkEntry.queries("q138_volume_anomaly")(spark, sf).collect().map { r =>
      (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))
    }.toSet
    assert(got == expected)
    // row-count conservation: one row per observed (type, day)
    assert(got.size == evs.distinct.size)
  }

  test("q145 embedding drift matches a scalar cross-multiplied recomputation") {
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    def e6(x: Float): Long = BigDecimal(x.toDouble * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val dims = vecs.head._3.length
    val expected = vecs.groupBy(_._2).flatMap { case (label, vs) =>
      val (as, bs) = vs.partition(_._1 % 2 == 0)
      if (as.isEmpty || bs.isEmpty) None
      else {
        val (na, nb) = (as.size.toLong, bs.size.toLong)
        var drift = 0L
        var maxGap = 0L
        (0 until dims).foreach { d =>
          val sa = as.map(v => e6(v._3(d))).sum
          val sb = bs.map(v => e6(v._3(d))).sum
          val gap = (sa * nb - sb * na).toDouble / (na * nb).toDouble
          drift += BigDecimal(gap * gap).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          maxGap = math.max(maxGap,
            BigDecimal(math.abs(gap)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }
        Some((label, na, nb, drift, maxGap))
      }
    }.toSet
    val got = SparkEntry.queries("q145_embedding_drift")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the max single-dimension gap can never exceed the total drift's
    // square root (it is one of the summed squares)
    got.foreach { case (label, _, _, drift, maxGap) =>
      assert(maxGap.toDouble * maxGap <= drift.toDouble + 1, s"label $label") }
  }

  test("q148 attribution sweep matches a scalar as-of recomputation and q52's pass") {
    def pctl(sorted: Seq[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo).toDouble
    }
    def rnd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables(spark, sf).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // per purchase: gap to the latest strictly-prior same-user click
    val gaps = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.collect { case ((_, _, "purchase", us), i) =>
        sorted.take(i).reverse.collectFirst { case (_, _, "click", cus) => us - cus }
      }
    }
    val expected = Seq(300L, 1800L, 7200L).map { ws =>
      val attributed = gaps.collect { case Some(g) if g <= ws * 1000000L => g }
      (ws, gaps.size.toLong, attributed.size.toLong,
        rnd(attributed.size.toDouble / gaps.size, 4),
        if (attributed.isEmpty) None
        else Some(rnd(pctl(attributed.sorted, 0.5) / 1e6, 2)))
    }.toSet
    val got = SparkEntry.queries("q148_attribution_sweep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got == expected)
    // wider windows can only attribute more; q52's pass is the same as-of
    val byW = got.toSeq.sortBy(_._1).map(_._3)
    assert(byW.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true })
    val q52n = SparkEntry.queries("q52_asof_join")(spark, sf).collect()
      .count(_.getAs[Long]("last_click_us") >= 0L)
    assert(q52n.toLong == gaps.count(_.isDefined).toLong,
      "q52's attributed purchases disagree with the scalar as-of")
  }

  test("q149 hourly seasonality matches a scalar fold with conservation") {
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables(spark, sf).events
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).flatMap { case (tpe, xs) =>
      val byH = xs.groupBy(_._2).map { case (h, es) => h -> es.size.toLong }
      val total = xs.size.toLong
      val mx = byH.values.max
      byH.map { case (h, n) =>
        (tpe, h, n, rnd4(n.toDouble / total), n == mx)
      }
    }.toSet
    val got = SparkEntry.queries("q149_hourly_seasonality")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSet
    assert(got == expected)
    // conservation: per type, the profile holds every event exactly once
    val volumes = evs.groupBy(_._1).map { case (t2, xs) => t2 -> xs.size.toLong }
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      assert(rows.toSeq.map(_._3).sum == volumes(tpe), tpe)
      assert(rows.exists(_._5), s"$tpe has no peak hour")
    }
  }

  test("q150 source diversity matches a scalar entropy recomputation with bounds") {
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val labels = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue)).toMap
    val bySrc = Tables(spark, sf).documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .collect { case (id, src) if labels.contains(id) => (src, labels(id)) }
    val expected = bySrc.groupBy(_._1).map { case (src, xs) =>
      val byL = xs.groupBy(_._2).map { case (_, es) => es.size.toLong }.toSeq
      val total = xs.size.toLong
      val entropy = byL.map { n =>
        val p = n.toDouble / total
        BigDecimal(-p * math.log(p) * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (src, total, byL.size.toLong, entropy, rnd4(byL.max.toDouble / total))
    }.toSet
    val got = SparkEntry.queries("q150_source_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
    // entropy is bounded by ln of the label count; one-label sources hit 0
    got.foreach { case (src, _, nl, e, _) =>
      assert(e <= math.ceil(math.log(nl.toDouble) * 1000000).toLong + nl, src)
      if (nl == 1) assert(e == 0L, src)
    }
  }

  test("q104 cluster sample matches an independent hash-rank recomputation and retunes the cap") {
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue))
    def expected(k: Int) = vecs.groupBy(_._2).map { case (label, vs) =>
      val kept = vs.map(_._1).sortBy(id => (((id % 2147483647L) * 2654435761L) % 4294967296L, id)).take(k)
      (label, vs.length.toLong, kept.length.toLong, kept.sum,
        rnd4(kept.length.toDouble / vs.length))
    }.toSet
    def got() = SparkEntry.queries("q104_cluster_sample")(spark, sf).collect().map { r =>
      (r.getAs[Number]("label").intValue, r.getAs[Long]("n_vecs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_id_sum"), r.getAs[Double]("sample_rate"))
    }.toSet
    assert(got() == expected(8))
    // the cap is a runtime conf, not a recompile
    spark.conf.set("graft.sample.perCluster", "3")
    try assert(got() == expected(3))
    finally spark.conf.unset("graft.sample.perCluster")
  }

  test("q107 delta dedup matches an independent incremental-classification recomputation") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hex32(m: String): Long = java.lang.Long.parseLong(m.take(8), 16)
    // the kernel's minhash definition, rebuilt from its published formula
    // (md5 → first-8-hex int → per-band linear rehash → min), independent
    // of functions.MinHash
    def sigs(text: String): Seq[(Int, Long)] = {
      val ws = text.split(" ", -1)
      if (ws.length < 3) Seq.empty
      else {
        val hs = (0 to ws.length - 3).map(i => hex32(md5hex(ws.slice(i, i + 3).mkString(" "))))
        (0 until 8).map(b => b -> hs.map(h => (h * (2 * b + 1) + 7919L * b) % 2147483647L).min)
      }
    }
    val rows = Tables(spark, sf).documents
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def expected(prefix: String) = {
      val (inc, base) = rows.partition(_._2.startsWith(prefix))
      val baseH = base.map(r => md5hex(r._3)).toSet
      val baseSigs = base.flatMap(r => sigs(r._3)).toSet
      val canon = inc.groupBy(r => md5hex(r._3)).map { case (h, xs) => h -> xs.map(_._1).min }
      val classed = inc.map { case (id, src, text, nc) =>
        val h = md5hex(text)
        val cls =
          if (baseH(h)) "exact_dup_base"
          else if (canon(h) != id) "exact_dup_batch"
          else if (sigs(text).exists(baseSigs)) "near_dup_base"
          else "new_unique"
        (src, cls, nc)
      }
      // the four classes partition the incoming batch exactly
      assert(classed.length == inc.length)
      classed.groupBy(t => (t._1, t._2)).map { case ((src, cls), xs) =>
        (src, cls, xs.length.toLong, xs.map(_._3).sum)
      }.toSet
    }
    def got() = SparkEntry.queries("q107_delta_dedup")(spark, sf).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[String]("cls"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_chars"))
    }.toSet
    assert(got() == expected("src1"))
    // which family is "the arriving batch" is a runtime conf, no recompile
    spark.conf.set("graft.delta.incoming", "src2%")
    try assert(got() == expected("src2"))
    finally spark.conf.unset("graft.delta.incoming")
  }

  test("q108 blob near-dup matches an independent histogram-blocking recomputation") {
    val rows = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    def mt(text: String) = text.head.toInt % 3 match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    def hist(text: String): Array[Long] = {
      val h = new Array[Long](16)
      text.getBytes("UTF-8").foreach(b => h((b & 0xff) >>> 4) += 1)
      h
    }
    val blobs = rows.map { case (id, text, nc) =>
      val hh = hist(text)
      (id, mt(text), nc, hh, hh.map(c => (c * 8) / nc).mkString("_"))
    }
    val expected = blobs.groupBy(_._2).map { case (m, bs) =>
      val byBlock = bs.groupBy(_._5)
      val verdicts = byBlock.values.flatMap { blk =>
        for { x <- blk; y <- blk if x._1 < y._1 } yield {
          val l1 = x._4.zip(y._4).map { case (p, q) => math.abs(p - q) }.sum
          l1 * 100 <= (x._3 + y._3) * 5
        }
      }.toSeq
      (m, bs.length.toLong, byBlock.size.toLong,
        verdicts.length.toLong, verdicts.count(identity).toLong)
    }.toSet
    val got = SparkEntry.queries("q108_blob_neardup")(spark, sf).collect().map { r =>
      (r.getAs[String]("media_type"), r.getAs[Long]("n_blobs"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_cand_pairs"), r.getAs[Long]("n_near_pairs"))
    }.toSet
    assert(got == expected)
  }

  test("q109 audit matches an independent norm recomputation and flags crafted degenerates") {
    def rnd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getAs[Number]("label").intValue,
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    val expected = vecs.groupBy(_._1).map { case (label, vs) =>
      val n2 = vs.map { case (_, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
        rnd(acc * 1e6, 0).toLong
      }
      (label, vs.length.toLong, 0L, n2.count(_ == 0L).toLong,
        n2.min, n2.max, rnd(n2.sum.toDouble / n2.length, 2))
    }.toSet
    val got = SparkEntry.queries("q109_embedding_audit")(spark, sf).collect().map { r =>
      (r.getAs[Number]("label").intValue, r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_nonfinite"), r.getAs[Long]("n_zero"),
        r.getAs[Long]("min_norm2_e6"), r.getAs[Long]("max_norm2_e6"),
        r.getAs[Double]("avg_norm2_e6"))
    }.toSet
    assert(got == expected)
    // the kernel over a relation that actually contains degenerates
    import spark.implicits._
    val crafted = Seq(
      (0, Seq(1f, 2f)),
      (0, Seq(Float.NaN, 1f)),
      (1, Seq(Float.PositiveInfinity, 1f)),
      (1, Seq(0f, 0f)),
      (1, Seq(3f, 4f))).toDF("label", "v")
    val audit = graft.operators.Similarity.auditEmbeddings(crafted).collect()
      .map(r => r.getAs[Number]("label").intValue ->
        (r.getAs[Long]("n_nonfinite"), r.getAs[Long]("n_zero"))).toMap
    assert(audit(0) == ((1L, 0L)))
    assert(audit(1) == ((1L, 1L)))
  }

  test("q112 temporal split matches an independent percentile recomputation and splits are time-ordered") {
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pctl(sorted: IndexedSeq[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo).toDouble
    }
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val sorted = ev.map(_._3).sorted.toIndexedSeq
    val (p80, p90) = (pctl(sorted, 0.8), pctl(sorted, 0.9))
    val staged = ev.map { case (u, et, us) =>
      val split = if (us <= p80) "train" else if (us <= p90) "val" else "test"
      (split, u, et, us)
    }
    val expected = staged.groupBy(_._1).map { case (split, xs) =>
      (split, xs.size.toLong, xs.map(_._2).distinct.size.toLong,
        xs.map(_._4).min, xs.map(_._4).max,
        rnd4(xs.count(_._3 == "purchase").toDouble / xs.size))
    }.toSet
    val got = SparkEntry.queries("q112_temporal_split")(spark, sf).collect().map { r =>
      (r.getAs[String]("split"), r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
        r.getAs[Long]("us_min"), r.getAs[Long]("us_max"), r.getAs[Double]("purchase_share"))
    }.toSet
    assert(got == expected)
    // the whole point: splits are strictly time-ordered (no leakage)
    val env = got.map(r => r._1 -> (r._4, r._5)).toMap
    for {
      (a, b) <- Seq(("train", "val"), ("val", "test"))
      ((_, maxA), (minB, _)) <- env.get(a).zip(env.get(b))
    } assert(maxA < minB, s"$a overlaps $b in time")
  }

  test("q114 sweep agrees with q84 at the production cut and keeps monotonically fewer as cuts rise") {
    val rows = SparkEntry.queries("q114_gate_sweep")(spark, sf).collect()
      .map(r => (r.getAs[Double]("cut"), r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept")))
    // the 0.45 arm IS q84's gate, per source
    val kept84 = SparkEntry.queries("q84_quality_gate")(spark, sf).collect()
      .filter(_.getAs[String]("reason") == "kept")
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    rows.filter(_._1 == 0.45).foreach { case (_, src, _, nKept) =>
      assert(kept84.getOrElse(src, 0L) == nKept, s"$src disagrees with q84")
    }
    // raising the cut can only shrink the kept set
    val bySrc = rows.groupBy(_._2)
    bySrc.values.foreach { arms =>
      val sorted = arms.sortBy(_._1).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    // every arm sees the whole corpus
    assert(rows.map(_._1).distinct.length == 3)
    bySrc.values.foreach(arms => assert(arms.map(_._3).distinct.length == 1))
  }

  test("q96 funnel matches an independent per-user stage recomputation") {
    val events = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    def firstAfter(es: Array[(Long, String, Long)], kind: String, after: Option[Long]) =
      after.flatMap(a =>
        es.filter(e => e._2 == kind && e._3 > a).map(_._3).sorted.headOption)
    val stages = byUser.map { case (_, es) =>
      val t1 = es.filter(_._2 == "view").map(_._3).sorted.headOption
      val t2 = firstAfter(es, "click", t1)
      val t3 = firstAfter(es, "purchase", t2)
      (t1, t2, t3)
    }.toSeq
    val converted = stages.collect { case (Some(a), _, Some(c)) => c - a }
    val expAvg = BigDecimal(converted.sum.toDouble / converted.size / 1000000.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = SparkEntry.queries("q96_funnel")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_users") == byUser.size)
    assert(r.getAs[Long]("n_view") == stages.count(_._1.isDefined))
    assert(r.getAs[Long]("n_click") == stages.count(_._2.isDefined))
    assert(r.getAs[Long]("n_purchase") == stages.count(_._3.isDefined))
    assert(r.getAs[Double]("avg_secs_to_convert") == expAvg)
    // the funnel can only narrow
    assert(r.getAs[Long]("n_view") >= r.getAs[Long]("n_click"))
    assert(r.getAs[Long]("n_click") >= r.getAs[Long]("n_purchase"))
  }

  test("q119 retention cohorts match an independent first-touch recomputation") {
    import java.time.{DayOfWeek, ZoneOffset}
    import java.time.temporal.ChronoUnit
    // independent Monday truncation — plain java.time, no Spark date_trunc
    val evs = Tables(spark, sf).events
      .select(col("user_id"), col("ts"))
      .collect()
      .map { r =>
        val d = r.getTimestamp(1).toInstant.atZone(ZoneOffset.UTC).toLocalDate
        (r.getLong(0), d.minusDays((d.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue).toLong))
      }
    val firstTouch = evs.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min(Ordering.by((x: java.time.LocalDate) => x.toEpochDay)) }
    val sizes = firstTouch.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val cells = evs.map { case (u, wk) =>
      val cohort = firstTouch(u)
      (cohort, ChronoUnit.DAYS.between(cohort, wk) / 7, u)
    }.distinct
    val expected = cells.groupBy(c => (c._1, c._2)).map { case ((cohort, off), xs) =>
      val n = xs.size.toLong
      (cohort.toString, off, n, sizes(cohort),
        BigDecimal(n.toDouble / sizes(cohort)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q119_cohort_retention")(spark, sf).collect().map { r =>
      (r.getDate(0).toLocalDate.toString, r.getAs[Long]("offset_weeks"), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("retention"))
    }.toSet
    assert(got == expected)
    // week-0 cell IS the cohort: everyone is active the week they arrive
    got.filter(_._2 == 0L).foreach { c => assert(c._3 == c._4 && c._5 == 1.0) }
    // offsets are never negative (no event precedes its user's first touch)
    assert(got.forall(_._2 >= 0L))
  }

  private def hdiv(num: Long, den: Long): Long = (2 * num + den) / (2 * den)

  test("q153 k-anonymity matches an independent combo recomputation") {
    // hour from epoch-µs directly (UTC session) — independent of Spark's
    // hour() extraction
    val evs = Tables(spark, sf).events
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"), col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val combos = evs.groupBy { case (t, us, v, _) =>
      // floor semantics so a pre-epoch timestamp still lands on the same
      // hour-of-day Spark's hour() reports
      (t, Math.floorMod(Math.floorDiv(us, 3600000000L), 24L), math.floor(v / 50).toLong)
    }.map { case (k, xs) => k -> (xs.size.toLong, xs.map(_._4).distinct.size.toLong) }
    val expected = combos.toSeq.groupBy(_._1._1).map { case (tpe, xs) =>
      val risky = xs.filter(_._2._2 < 5)
      (tpe, xs.size.toLong, risky.size.toLong, risky.map(_._2._1).sum,
        xs.map(_._2._2).min)
    }.toSet
    val got = SparkEntry.queries("q153_k_anonymity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // rows-at-risk never exceed the type's volume; min combo users ≥ 1
    val vol = evs.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    got.foreach { case (tpe, nc, rc, rows, mn) =>
      assert(rc <= nc, tpe)
      assert(rows <= vol(tpe), tpe)
      assert(mn >= 1, tpe)
    }
  }

  test("q154 kNN reciprocity matches an independent within-cell recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the kernel's exact formula: left-to-right double accumulation,
    // dot / (||a||·||b||)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val byCell = vecs.groupBy(_._2)
    val edges: Set[(Int, Long, Long)] = byCell.toSeq.flatMap { case (cell, xs) =>
      xs.toSeq.flatMap { case (src, _, vs) =>
        xs.toSeq.filter(_._1 != src)
          .map { case (dst, _, vd) => (rnd6(cos(vs, vd)), dst) }
          .sortBy { case (sim, dst) => (-sim, dst) }
          .take(5)
          .map { case (_, dst) => (cell, src, dst) }
      }
    }.toSet
    val expected = byCell.map { case (cell, xs) =>
      val es = edges.filter(_._1 == cell)
      val mutual = es.count { case (c, a, b) => edges.contains((c, b, a)) }.toLong
      val ne = es.size.toLong
      (cell, xs.size.toLong, ne, mutual, if (ne == 0) 0L else hdiv(10000L * mutual, ne))
    }.toSet
    val got = SparkEntry.queries("q154_knn_reciprocity")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // directed mutual edges pair up (even count); edge count is k·n for
    // cells larger than k
    got.foreach { case (cell, nv, ne, nm, ratio) =>
      assert(nm % 2 == 0, s"cell $cell")
      assert(ne == nv * math.min(5L, nv - 1), s"cell $cell")
      assert(ratio >= 0 && ratio <= 10000, s"cell $cell")
    }
  }

  test("q215 kNN hubness matches an independent in-degree recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val byCell = vecs.groupBy(_._2)
    val expected = byCell.map { case (cell, xs) =>
      // q154's exact edge rule: k=5 within-cell by (cos desc, dst)
      val indeg = xs.toSeq.flatMap { case (src, _, vs) =>
        xs.toSeq.filter(_._1 != src)
          .map { case (dst, _, vd) => (rnd6(cos(vs, vd)), dst) }
          .sortBy { case (sim, dst) => (-sim, dst) }
          .take(5)
          .map(_._2)
      }.groupBy(identity).map { case (d, es) => d -> es.size.toLong }
      val nks = xs.toSeq.map { case (id, _, _) => indeg.getOrElse(id, 0L) }
      val n = nks.size
      val nEdges = nks.sum
      val sorted = nks.sorted
      val rank95 = (95 * n + 99) / 100
      val hubs = nks.count(_ >= 10).toLong
      val hubEdges = nks.filter(_ >= 10).sum
      (cell, n.toLong, nEdges, nks.max, sorted(rank95 - 1),
        hubs, nks.count(_ == 0).toLong,
        if (nEdges == 0) 0L else hdiv(10000L * hubEdges, nEdges))
    }.toSet
    val got = SparkEntry.queries("q215_knn_hubness")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // each vector has min(5, n-1) out-edges, so Σ in-degree must equal
    // that exact total; the census must be non-degenerate on this corpus
    // (probed: hubs AND a max N_k beyond k exist at every SF)
    got.foreach { case (cell, nv, ne, maxNk, p95, _, _, mass) =>
      assert(ne == nv * math.min(5L, nv - 1), s"cell $cell")
      assert(p95 <= maxNk, s"cell $cell")
      assert(mass >= 0 && mass <= 10000, s"cell $cell")
    }
    assert(got.map(_._4).max > 5, "degenerate: no cell has an N_k above k")
  }

  test("q156 tile pyramid matches an independent grid recomputation") {
    val keys = Tables(spark, sf).customer.select(col("c_custkey")).collect().map(_.getLong(0))
    val expected = Seq(2, 4, 6).map { z =>
      val n = 1L << z
      val tiles = keys.map { k =>
        val lon = ((k * 7919) % 360000).toDouble / 1000 - 180
        val lat = ((k * 104729) % 170000).toDouble / 1000 - 85
        (math.floor((lon + 180) / 360 * n).toLong, math.floor((90 - lat) / 180 * n).toLong)
      }.groupBy(identity).map { case (_, xs) => xs.size.toLong }
      (z, tiles.size.toLong, keys.length.toLong, tiles.max,
        hdiv(keys.length.toLong, tiles.size.toLong))
    }.toSet
    val got = SparkEntry.queries("q156_tile_pyramid")(spark, sf).collect()
      .map(r => (r.getAs[Number]("z").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // every zoom conserves the point set; refining the grid never merges
    // occupied tiles
    val byZ = got.toSeq.sortBy(_._1)
    assert(byZ.forall(_._3 == keys.length.toLong))
    byZ.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 >= a._2, s"zoom ${b._1} lost tiles")
      case _         =>
    }
  }

  test("q158 silhouette matches an independent centroid recomputation and q71's moves") {
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(v => math.floor(v.toDouble * 1000).toLong))
    }
    val cents = vecs.groupBy(_._2).map { case (l, xs) =>
      l -> (Array.tabulate(xs.head._3.length)(d => xs.map(_._3(d)).sum), xs.size.toLong)
    }
    def dist(q: Array[Long], c: (Array[Long], Long)): Double = {
      val (sq, cnt) = c
      var num = 0L
      var i = 0
      while (i < q.length) { val df = q(i) * cnt - sq(i); num += df * df; i += 1 }
      num.toDouble / (cnt * cnt).toDouble
    }
    val perVec = vecs.map { case (id, l, q) =>
      val a = dist(q, cents(l))
      val b = cents.collect { case (cl, c) if cl != l => dist(q, c) }.min
      val sil =
        if (math.max(a, b) == 0) 0L
        else math.floor((b - a) / math.max(a, b) * 10000).toLong
      (id, l, sil)
    }
    val expected = perVec.groupBy(_._2).map { case (l, xs) =>
      val n = xs.size.toLong
      (l, n, (2 * xs.map(_._3 + 10000).sum + n) / (2 * n) - 10000,
        xs.map(_._3).min, xs.count(_._3 < 0).toLong)
    }.toSet
    val got = SparkEntry.queries("q158_centroid_silhouette")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // family consistency: a strictly-misassigned vector (s < 0) is exactly
    // one q71's Lloyd step moves (same metric; ties, s = 0, may also move
    // on the clabel tie-break, so containment — not equality)
    val moved = SparkEntry.queries("q71_kmeans_step")(spark, sf).collect()
      .filter(r => r.getAs[Number]("old_label").longValue != r.getAs[Number]("new_label").longValue)
      .map(_.getAs[Long]("vec_id")).toSet
    val negative = perVec.filter(_._3 < 0).map(_._1).toSet
    assert(negative.subsetOf(moved),
      s"silhouette-misassigned not all moved by Lloyd: ${negative.diff(moved)}")
    // silhouette is a valid score and the corpus is fully covered
    assert(got.toSeq.map(_._2).sum == vecs.length.toLong)
    got.foreach { case (l, _, mean, mn, _) =>
      assert(mean >= -10000 && mean <= 10000, s"cell $l")
      assert(mn >= -10000 && mn <= 10000, s"cell $l")
    }
  }

  test("q204 self-join forecast matches an independent multiplicity fold") {
    val t = Tables(spark, sf)
    def branch(name: String, keys: Seq[Long]) = {
      val mult = keys.groupBy(identity).map(_._2.length.toLong).toSeq
      val (d, n) = (mult.size.toLong, mult.sum)
      val exact = mult.map(c => c * c).sum
      (name, d, n, exact, hdiv(n * n, d), hdiv(10000L * exact * d, n * n))
    }
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val oc = t.orders.select(col("o_custkey")).collect().map(_.getLong(0)).toSeq
    val expected = Set(
      branch("lineitem.l_orderkey", li.map(_._1).toSeq),
      branch("lineitem.l_partkey", li.map(_._2).toSeq),
      branch("lineitem.l_suppkey", li.map(_._3).toSeq),
      branch("orders.o_custkey", oc))
    def run() = SparkEntry.queries("q204_selfjoin_forecast")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    val got = run()
    assert(got == expected)
    spark.conf.set("graft.forecast.decimal", "true")
    try assert(run() == expected, "decimal-guarded q204 diverges")
    finally spark.conf.unset("graft.forecast.decimal")
    // Cauchy-Schwarz floor: the exact self-join size is never under the
    // uniform estimate (so inflation >= ~1), and equals n when keys are
    // unique
    got.foreach { case (name, d, n, exact, est, infl) =>
      assert(exact >= n && exact >= est - 1, name)
      assert(infl >= 9999L, s"$name inflation $infl < 1")
    }
  }

  test("q202 trailing RANGE frames match a direct per-customer scan") {
    val t = Tables(spark, sf)
    val orders = t.orders
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val Win = 30L * 86400L * 1000000L
    val byCust = orders.groupBy(_._2)
    val expected = orders.map { case (ok, ck, us, _) =>
      val frame = byCust(ck).filter(o => o._3 >= us - Win && o._3 <= us)
      (ok, ck, frame.length.toLong, frame.map(_._4).sum)
    }.toSet
    val got = SparkEntry.queries("q202_trailing_orders")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // frames are non-trivial: some order has company in its window
    assert(got.exists(_._3 > 1L), "degenerate: every trailing frame is a singleton")
  }

  test("q199 small-order revenue matches an independent per-part recomputation") {
    val t = Tables(spark, sf)
    val brands = t.part.select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = t.lineitem.select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avgQty = lines.groupBy(_._1).map { case (pk, xs) =>
      pk -> xs.map(_._2).sum / xs.length
    }
    def rnd2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = lines.filter { case (pk, q, _) => q < avgQty(pk) * 0.2 }
      .groupBy(l => brands(l._1))
      .map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._3).sum) }
    val got = SparkEntry.queries("q199_small_orders")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (b, (n, rev)) =>
      assert(n == expected(b)._1, b)
      // sum order differs between partial aggregation and this fold
      assert(math.abs(rev - rnd2(expected(b)._2)) < 0.011, s"$b $rev vs ${expected(b)._2}")
    }
  }

  test("q200 sole blockers match the classic EXISTS/NOT-EXISTS derivation") {
    val t = Tables(spark, sf)
    val orderDates = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val lines = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(l => orderDates.contains(l._1))
    val DayUs = 86400L * 1000000L
    val expected = lines.groupBy(_._1).toSeq.flatMap { case (ok, xs) =>
      val supps = xs.map(_._2).distinct
      val lateSupps = xs.filter(_._3 > orderDates(ok) + 90L * DayUs).map(_._2).distinct
      if (supps.size > 1 && lateSupps.size == 1) lateSupps.map(s => (ok, s)) else Nil
    }.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val names = t.supplier.select(col("s_suppkey"), col("s_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val top = expected.toSeq.map { case (s, n) => (names(s), s, n) }
      .sortBy { case (_, s, n) => (-n, s) }.take(20).toSet
    val got = SparkEntry.queries("q200_blocked_orders")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == top)
    assert(got.nonEmpty, "degenerate: no sole blockers")
  }

  test("q201 batch progress matches a MessageDigest multihash recomputation") {
    val md = (algo: String) => java.security.MessageDigest.getInstance(algo)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val docs = Tables(spark, sf).documents.select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val ordered = xs.sortBy(_._2)
      ordered.zipWithIndex.map { case ((_, id, text), i) =>
        val corrupted = if (id % 25 == 0) text + "X" else text
        val (algo, pre) = if (id % 2 == 0) ("SHA-256", "1220") else ("SHA-512", "1340")
        val expectedH = pre + hex(md(algo).digest(corrupted.getBytes("UTF-8")))
        val computedH = pre + hex(md(algo).digest(text.getBytes("UTF-8")))
        (src, i / 25L, id, computedH == expectedH)
      }
    }.groupBy(x => (x._1, x._2)).map { case ((src, b), xs) =>
      val failed = xs.filterNot(_._4)
      (src, b, xs.size.toLong, xs.count(_._4).toLong, failed.size.toLong,
        if (failed.isEmpty) null else java.lang.Long.valueOf(failed.map(_._3).min),
        if (failed.isEmpty) "VALIDATED" else "FAILED")
    }.toSet
    val got = SparkEntry.queries("q201_batch_progress")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)), r.getString(6)))
      .toSet
    assert(got == expected)
    // both verdicts appear on this corpus (probed: 4/20 batches fail)
    assert(got.exists(_._7 == "FAILED") && got.exists(_._7 == "VALIDATED"))
  }

  test("q196 price bands match an independent ratio recomputation") {
    val t = Tables(spark, sf)
    val parts = t.part.select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val lines = t.lineitem.select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = lines.map { case (pk, qty, ext) =>
      val (brand, retail) = parts(pk)
      (brand, ext / (qty * retail))
    }.groupBy(_._1).map { case (brand, xs) =>
      val rs = xs.map(_._2)
      val e4 = rs.map(r => math.floor(r * 10000 + 0.5).toLong)
      val over = rs.count(_ > 2.0).toLong
      (brand, rs.size.toLong, rs.count(_ < 0.5).toLong,
        rs.count(r => r >= 0.5 && r <= 2.0).toLong, over,
        hdiv(10000L * over, rs.size.toLong), e4.min, e4.max)
    }.toSet
    val got = SparkEntry.queries("q196_price_bands")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // the three bands partition every line
    got.foreach { case (b, n, u, p, o, _, _, _) => assert(u + p + o == n, b) }
  }

  test("q197 length quantiles equal a direct per-source sort's nearest ranks") {
    val rows = Tables(spark, sf).documents.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toLong
      def q(p: Long) = sorted(((p * n + 99) / 100 - 1).toInt)
      (src, n, q(25), q(50), q(75), q(95), q(75) - q(25))
    }.toSet
    val got = SparkEntry.queries("q197_length_quantiles")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // quantiles are ordered and within the observed range
    got.foreach { case (src, _, a, b, c, d, _) =>
      assert(a <= b && b <= c && c <= d, src)
    }
  }

  test("q231 median/MAD census matches a direct per-source recomputation") {
    val rows = Tables(spark, sf).documents.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def nearestRankMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted(((50L * sorted.length + 99) / 100 - 1).toInt)
    }
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val lens = xs.map(_._2).toSeq
      val med = nearestRankMedian(lens)
      val ads = lens.map(l => math.abs(l - med))
      val mad = nearestRankMedian(ads)
      val o15 = ads.count(a => 2 * a > 3 * mad).toLong
      val o20 = ads.count(a => a > 2 * mad).toLong
      val n = lens.length.toLong
      (src, n, med, mad, o15, o20, (2 * 10000 * o15 + n) / (2 * n), ads.max)
    }.toSet
    val got = SparkEntry.queries("q231_robust_outliers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // the shipped bands are populated somewhere (the 3× band is zero at
    // sf0.1 on this corpus — the reason 1.5×/2× ship instead)
    assert(got.exists(_._5 > 0), "degenerate: 1.5×MAD band empty everywhere")
    assert(got.exists(_._6 > 0), "degenerate: 2×MAD band empty everywhere")
  }

  test("q239 Mann-Whitney superiority matches a direct pairwise recomputation") {
    val rows = Tables(spark, sf).documents.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val mine = xs.map(_._2)
      val rest = rows.collect { case (s, l) if s != src => l }
      // brute-force: every (mine, rest) pair — wins count 2, ties 1
      val twoU = mine.iterator.map { m =>
        rest.count(m > _).toLong * 2 + rest.count(m == _).toLong
      }.sum
      val (n1, n2) = (mine.length.toLong, rest.length.toLong)
      val sup = (1000000L * twoU + n1 * n2) / (2 * n1 * n2)
      val dir = java.lang.Long.signum(twoU - n1 * n2).toLong
      (src, n1, n2, twoU, sup, dir)
    }.toSet
    def run() = SparkEntry.queries("q239_mann_whitney")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL(38,0) overflow-guard path is value-identical
    spark.conf.set("graft.mwu.decimal", "true")
    try assert(run() == got)
    finally spark.conf.unset("graft.mwu.decimal")
    // a two-sided audit: some source runs long, some runs short
    assert(got.exists(_._6 > 0) && got.exists(_._6 < 0),
      "degenerate: every source on the same side")
    // identity: 2U ≤ 2·n1·n2, superiority in [0, 1e6]
    got.foreach { case (src, n1, n2, u2, sup, _) =>
      assert(u2 <= 2 * n1 * n2 && sup >= 0 && sup <= 1000000L, src)
    }
  }

  test("q238 Cohen's kappa matches a direct confusion-matrix recomputation") {
    // independent classifier: plain Scala over the same stopword lists
    val sets = Map(
      "en" -> Set("the", "a", "of", "and", "is"),
      "es" -> Set("el", "la", "de", "y", "es"),
      "de" -> Set("der", "die", "das", "und", "ist"),
      "fr" -> Set("le", "la", "de", "et", "est"))
    def predict(text: String): String = {
      val ws = text.split(" ", -1)
      def sc(l: String) = ws.count(sets(l))
      val (en, es, de, fr) = (sc("en"), sc("es"), sc("de"), sc("fr"))
      if (en >= es && en >= de && en >= fr && en > 0) "en"
      else if (es >= de && es >= fr && es > 0) "es"
      else if (de >= fr && de > 0) "de"
      else if (fr > 0) "fr"
      else "und"
    }
    val docs = Tables(spark, sf).documents.select(col("source"), col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), predict(r.getString(2))))
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val agree = xs.count(x => x._2 == x._3).toLong
      val rows = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cols = xs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val rc = rows.map { case (l, rn) => rn * cols.getOrElse(l, 0L) }.sum
      val po = (2 * 10000 * agree + n) / (2 * n)
      val pe = (2 * 10000 * rc + n * n) / (2 * n * n)
      val (knum, kden) = (n * agree - rc, n * n - rc)
      val kappa =
        if (kden == 0) 0L
        else if (knum < 0) -((2 * 10000 * -knum + kden) / (2 * kden))
        else (2 * 10000 * knum + kden) / (2 * kden)
      (src, n, agree, po, pe, kappa)
    }.toSet
    def run() = SparkEntry.queries("q238_cohens_kappa")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL(38,0) overflow-guard path is value-identical (q173's
    // guard pattern)
    spark.conf.set("graft.kappa.decimal", "true")
    try assert(run() == got)
    finally spark.conf.unset("graft.kappa.decimal")
    // the signed division's both branches fire on this corpus, and
    // kappa is bounded by its theoretical ceiling
    assert(got.exists(_._6 > 0) && got.exists(_._6 < 0),
      "degenerate: kappa one-signed everywhere")
    got.foreach { case (src, _, _, po, _, k) =>
      assert(k <= 10000 && po <= 10000, src)
    }
  }

  test("q236 order cadence matches a direct per-customer gap recomputation") {
    val t = Tables(spark, sf)
    val segs = t.customer.select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ords = t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ords.groupBy(_._1).toSeq.flatMap { case (ck, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2))
      sorted.zip(sorted.tail).map { case (a, b) =>
        (segs(ck), (b._3 / 86400000000L) - (a._3 / 86400000000L))
      }
    }
    def rank(xs: Seq[Long], p: Long): Long = {
      val sorted = xs.sorted
      sorted(((p * sorted.length + 99) / 100 - 1).toInt)
    }
    val expected = gaps.groupBy(_._1).map { case (seg, xs) =>
      val g = xs.map(_._2)
      (seg, g.length.toLong, rank(g, 25), rank(g, 50), rank(g, 90), g.max)
    }.toSet
    val got = SparkEntry.queries("q236_order_cadence")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected)
    got.foreach { case (seg, n, a, b, c, mx) =>
      assert(n > 0 && a <= b && b <= c && c <= mx, seg)
    }
  }

  test("q237 cohort LTV matches a direct first-year-cohort recomputation") {
    val ords = Tables(spark, sf).orders
      .select(col("o_custkey"), year(col("o_orderdate")), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val cohort = ords.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val size = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = ords.groupBy(o => (cohort(o._1), o._2 - cohort(o._1)))
      .map { case ((cy, age), xs) => ((cy, age), (xs.size.toLong, xs.map(_._3).sum)) }
    val expected = cells.map { case ((cy, age), (n, sp)) =>
      val cum = cells.collect { case ((c2, a2), (_, s2)) if c2 == cy && a2 <= age => s2 }.sum
      (cy, age, n, sp, cum, size(cy), (2 * cum + size(cy)) / (2 * size(cy)))
    }.toSet
    val got = SparkEntry.queries("q237_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // LTV curves are monotone in age within a cohort
    val byCohort = got.toSeq.groupBy(_._1)
    byCohort.foreach { case (cy, xs) =>
      val curve = xs.sortBy(_._2).map(_._5)
      assert(curve == curve.sorted, s"cohort $cy LTV not monotone")
    }
    assert(byCohort.size > 1, "degenerate: a single cohort")
  }

  test("q254 gains curve matches a direct descending-spend fold") {
    val spend = Tables(spark, sf).orders
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val hist = spend.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(-_._1)
    val n = spend.size.toLong
    val totalRev = spend.values.sum
    var (cumCnt, cumRev) = (0L, 0L)
    val rows = hist.map { case (v, cnt) =>
      cumCnt += cnt; cumRev += v * cnt
      (((cumCnt - 1) * 10) / n + 1, cnt, v * cnt, cumCnt, cumRev)
    }
    val expected = rows.groupBy(_._1).map { case (dec, xs) =>
      val cc = xs.map(_._4).max
      val cr = xs.map(_._5).max
      (dec, xs.map(_._2).sum, xs.map(_._3).sum, cr,
        (2 * 10000 * cc + n) / (2 * n), (2 * 10000 * cr + totalRev) / (2 * totalRev))
    }.toSet
    val got = SparkEntry.queries("q254_gains_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the curve is a Lorenz majorization: cumulative revenue share always
    // at or above cumulative customer share (sorted descending), both
    // monotone to exactly 1, and customers conserve
    val curve = got.toSeq.sortBy(_._1)
    curve.foreach { case (d, _, _, _, cs, rs) => assert(rs >= cs, s"decile $d") }
    assert(curve.map(_._5) == curve.map(_._5).sorted && curve.last._5 == 10000L)
    assert(curve.map(_._6) == curve.map(_._6).sorted && curve.last._6 == 10000L)
    assert(curve.map(_._2).sum == n)
  }

  test("q253 line-sequence audit matches a direct per-order classification") {
    val lines = Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val perOrder = lines.groupBy(_._1).map { case (ok, xs) =>
      val ns = xs.map(_._2)
      val (n, mn, mx, nd) = (ns.length, ns.min, ns.max, ns.distinct.length)
      val cls =
        if (nd < n) "duplicate"
        else if (mn > 1) "late_start"
        else if (mx > n) "gap"
        else "clean"
      (ok, n.toLong, mn, mx, cls)
    }
    val expected = perOrder.groupBy(_._5).map { case (cls, xs) =>
      (cls, xs.size.toLong, xs.map(_._2).sum,
        xs.map(x => (x._4 - x._3).toLong).max, xs.map(_._1).min)
    }.toSet
    val got = SparkEntry.queries("q253_line_sequence")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // the four classes partition the order population — all live, none
    // overlapping (conservation), and a clean order has span n−1 exactly
    assert(got.map(_._1) == Set("clean", "duplicate", "late_start", "gap"))
    assert(got.toSeq.map(_._2).sum == perOrder.size.toLong)
    perOrder.filter(_._5 == "clean").foreach { case (ok, n, mn, mx, _) =>
      assert(mn == 1 && mx.toLong == n, s"order $ok misclassified clean")
    }
  }

  test("q251 Theil's U matches a direct conditional-entropy recomputation") {
    val cells = Tables(spark, sf).documents
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bitsE3(n: Long, den: Long): Long =
      math.floor(-(math.log(n.toDouble / den) / math.log(2.0)) * 1000 + 0.5).toLong
    def hdiv2(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
    val srcM = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val langM = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = srcM.values.sum
    def condH(group: Map[String, Seq[((String, String), Long)]], marg: Map[String, Long]): Map[String, Long] =
      group.map { case (k, xs) =>
        k -> hdiv2(xs.map { case (_, n) => n * bitsE3(n, marg(k)) }.sum, marg(k))
      }
    val hS = condH(cells.toSeq.groupBy(_._1._2), srcM)
    val hL = condH(cells.toSeq.groupBy(_._1._1), langM)
    val hLangCond = hdiv2(hS.map { case (s, h) => srcM(s) * h }.sum, nn)
    val hSrcCond = hdiv2(hL.map { case (l, h) => langM(l) * h }.sum, nn)
    val hLang = hdiv2(langM.values.map(n => n * bitsE3(n, nn)).sum, nn)
    val hSrc = hdiv2(srcM.values.map(n => n * bitsE3(n, nn)).sum, nn)
    val uLS = hdiv2(10000L * math.max(hLang - hLangCond, 0), hLang)
    val uSL = hdiv2(10000L * math.max(hSrc - hSrcCond, 0), hSrc)
    val expected = hS.map { case (s, h) =>
      (s, srcM(s), h, hLang, hLangCond, uLS, uSL)
    }.toSet
    val got = SparkEntry.queries("q251_theils_u")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // U is a share of removed entropy: within [0, 1]; conditioning can
    // only remove entropy up to quantization (h_cond ≤ h + 1 e3-unit)
    assert(uLS >= 0L && uLS <= 10000L && uSL >= 0L && uSL <= 10000L)
    assert(hLangCond <= hLang + 1)
    // per-source conditional entropies genuinely vary (no collapsed axis)
    assert(hS.values.toSet.size > 1)
  }

  test("q250 supplier skyline matches a brute-force dominance recomputation") {
    val t = Tables(spark, sf)
    val dates = t.orders.select(col("o_orderkey"), to_date(col("o_orderdate"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay)).toMap
    val per = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")),
        col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map { r =>
        (r.getLong(1), r.getDate(2).toLocalDate.toEpochDay - dates(r.getLong(0)),
          math.floor(r.getDouble(3) / r.getDouble(4) * 100 + 0.5).toLong)
      }
      .groupBy(_._1).map { case (sk, xs) =>
        val n = xs.length.toLong
        val shift = 10000000L
        val lead = (2 * (100 * xs.map(_._2).sum + n * shift) + n) / (2 * n) - shift
        val price = (2 * 100 * xs.map(_._3).sum + n) / (2 * n)
        (sk, n, lead, price)
      }.toSeq
    // brute O(n²) dominance — the quadratic the RANGE-window formulation avoids
    def dominated(a: (Long, Long, Long, Long)): Boolean = per.exists { b =>
      b._1 != a._1 && b._3 <= a._3 && b._4 <= a._4 && (b._3 < a._3 || b._4 < a._4)
    }
    val names = t.supplier.select(col("s_suppkey"), col("s_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val sky = per.filterNot(dominated)
    val expected = sky
      .map(s => (s._1, names(s._1), s._2, s._3, s._4, per.length.toLong, sky.length.toLong))
      .sortBy(x => (x._4, x._5, x._1)).toSeq
    val got = SparkEntry.queries("q250_supplier_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // the frontier is a strictly-decreasing price curve over increasing lead
    val curve = got.sortBy(_._4).map(_._5)
    assert(curve == curve.sorted.reverse && curve.distinct == curve,
      s"frontier not strictly monotone: $curve")
    assert(got.nonEmpty && got.length < per.length, "degenerate skyline")
  }

  test("q249 RFM segmentation matches a direct quintile-scoring recomputation") {
    val t = Tables(spark, sf)
    val ords = t.orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val maxD = ords.map(_._2).maxBy(_.toEpochDay)
    val cust = ords.groupBy(_._1).map { case (ck, xs) =>
      val last = xs.map(_._2).maxBy(_.toEpochDay)
      (ck, maxD.toEpochDay - last.toEpochDay, xs.length.toLong, xs.map(_._3).sum)
    }.toSeq
    def bnds(vs: Seq[Long]): Seq[Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = vs.length.toLong
      (1 to 4).map { k =>
        var cum = 0L
        hist.find { case (_, c) => cum += c; 5 * cum >= k * n }.get._1
      }
    }
    val (rb, fb, mb) = (bnds(cust.map(_._2)), bnds(cust.map(_._3)), bnds(cust.map(_._4)))
    def q(v: Long, b: Seq[Long]): Long = 1L + b.count(v > _)
    val expected = cust
      .map { case (_, r, f, m) => ((6 - q(r, rb), q(f, fb), q(m, mb)), (r, f, m)) }
      .groupBy(_._1)
      .map { case ((rs, fs, ms), xs) =>
        val n = xs.length.toLong
        (rs, fs, ms, n,
          (2 * xs.map(_._2._1).sum + n) / (2 * n),
          (2 * 100 * xs.map(_._2._2).sum + n) / (2 * n),
          xs.map(_._2._3).sum)
      }.toSet
    val got = SparkEntry.queries("q249_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // scores live on the 1–5 grid, every customer lands in exactly one cell
    assert(got.toSeq.map(_._4).sum == cust.length.toLong)
    got.foreach { case (rs, fs, ms, _, _, _, _) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
    }
    // the grid is genuinely multi-dimensional (no axis collapsed)
    assert(got.map(_._1).size > 1 && got.map(_._2).size > 1 && got.map(_._3).size > 1)
  }

  test("q245 order backlog matches a direct placed-vs-done ledger recomputation") {
    val t = Tables(spark, sf)
    val placed = t.orders
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long"))
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // ym = y·100+m is monotone in date, so max(ym) over an order's lines
    // is the ym of its last shipment
    val done = t.lineitem
      .select(col("l_orderkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).max)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val months = (placed.keySet ++ done.keySet).toSeq.sorted
    var (pc, dc) = (0L, 0L)
    val expected = months.map { ym =>
      val (p, d) = (placed.getOrElse(ym, 0L), done.getOrElse(ym, 0L))
      pc += p; dc += d
      (ym, p, d, pc, dc, pc - dc)
    }
    val got = SparkEntry.queries("q245_order_backlog")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the curve has real structure: backlog moves, and orders with no
    // lines keep the final backlog strictly positive
    val backlogs = got.map(_._6)
    assert(backlogs.max > backlogs.min, "degenerate: flat backlog")
    assert(backlogs.last > 0L, "no-line orders must never leave the backlog")
    assert(got.map(_._2).sum == got.last._4, "placed ledger does not conserve")
  }

  test("q246 share-of-parent matches a direct two-level hierarchy fold") {
    val t = Tables(spark, sf)
    val natOf = t.customer.select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nation = t.nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => (r.getInt(0), (r.getString(1), r.getInt(2)))).toMap
    val region = t.region.select(col("r_regionkey"), col("r_name")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val perNat = t.orders.select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (natOf(r.getLong(0)), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val perRegion = perNat.toSeq.groupBy(x => nation(x._1)._2)
      .view.mapValues(_.map(_._2._2).sum).toMap
    val global = perNat.values.map(_._2).sum
    val expected = perNat.map { case (nk, (n, rev)) =>
      val (nm, rk) = nation(nk)
      val rr = perRegion(rk)
      (nm, region(rk), n, rev, rr,
        (2 * 10000 * rev + rr) / (2 * rr), (2 * 10000 * rr + global) / (2 * global))
    }.toSet
    val got = SparkEntry.queries("q246_share_of_parent")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // shares are conserved up to rounding: nations within a region sum to
    // ~1, regions over the globe sum to ~1
    got.groupBy(_._2).foreach { case (r, xs) =>
      val s = xs.toSeq.map(_._6).sum
      assert(math.abs(s - 10000L) <= xs.size, s"region $r nation shares sum $s")
    }
    val rs = got.groupBy(_._2).map { case (_, xs) => (xs.head._5, xs.head._7) }
    val rSum = rs.map(_._2).sum
    assert(math.abs(rSum - 10000L) <= rs.size, s"region shares sum $rSum")
  }

  test("q235 byte percentiles match a direct mass-cumulative recomputation") {
    val rows = Tables(spark, sf).documents.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val lens = xs.map(_._2).sorted
      val n = lens.length.toLong
      val tot = lens.sum
      def massPick(num: Long, den: Long): Long = {
        // smallest len whose cumulative char mass reaches num/den of tot
        var cum = 0L
        lens.find { l => cum += l; den * cum >= num * tot }.get
      }
      val med = lens(((50L * n + 99) / 100 - 1).toInt)
      val heavy = lens.filter(_ > med).sum
      (src, n, tot, med, massPick(1, 2), massPick(9, 10),
        (2 * 10000 * heavy + tot) / (2 * tot))
    }.toSet
    val got = SparkEntry.queries("q235_byte_percentiles")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // byte percentiles sit at or above their count twin on every source,
    // and the heavy tail holds real mass — the reason this operator exists
    got.foreach { case (src, _, _, med, b50, b90, hm) =>
      assert(b50 >= med && b90 >= b50, src)
      assert(hm > 0 && hm < 10000, src)
    }
  }

  test("q234 rolling actives match a direct trailing-window recomputation") {
    val ud = Tables(spark, sf).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.collect { case (u, ad) if ad >= d - 6 && ad <= d => u }.distinct.length.toLong
      (d, dau, wau, (2 * 10000 * dau + wau) / (2 * wau))
    }.toSet
    val got = SparkEntry.queries("q234_rolling_actives")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // DAU never exceeds the window that contains it; stickiness ≤ 1
    got.foreach { case (d, dau, wau, s) =>
      assert(dau <= wau && s <= 10000, s"day $d")
    }
    // non-degenerate: the trailing window genuinely widens past its
    // last day somewhere (at sf0.001 WAU is constant — every user is
    // active within every window — but DAU < WAU still separates them;
    // WAU itself varies from sf0.01 up, probed 134–150)
    assert(got.exists(t => t._2 < t._3),
      "degenerate: DAU equals WAU on every day")
  }

  test("q232 zone-map audit matches a direct block min/max recomputation") {
    val evs = Tables(spark, sf).events
      .select(col("event_id"), unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getLong(0) / 512, r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val thrTs = evs.map(_._2).max - 604800000000L
    val thrV = 15000L
    val blocks = evs.groupBy(_._1).map { case (_, xs) =>
      (xs.map(_._2).max, xs.map(_._3).max,
        xs.count(_._2 >= thrTs).toLong, xs.count(_._3 >= thrV).toLong)
    }.toSeq
    val nb = blocks.length.toLong
    def mk(name: String, touched: Long, matched: Long) =
      (name, nb, touched, matched, (2 * 10000 * touched + nb) / (2 * nb),
        (matched + 511) / 512)
    val expected = Set(
      mk("ts_last7d", blocks.count(_._1 >= thrTs).toLong, blocks.map(_._3).sum),
      mk("value_ge150", blocks.count(_._2 >= thrV).toLong, blocks.map(_._4).sum))
    val got = SparkEntry.queries("q232_zonemap_skipping")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected)
    // both predicates select something, and zone maps can never touch
    // fewer blocks than the perfectly-clustered bound
    got.foreach { case (p, _, touched, matched, _, ideal) =>
      assert(matched > 0, s"degenerate: $p matches nothing")
      assert(touched >= ideal, s"$p touched $touched < ideal $ideal")
    }
  }

  test("q198 session rollup matches an independent gap sessionization") {
    val evs = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val GapUs = 14400L * 1000000L
    def rnd2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = evs.groupBy(_._1).map { case (u, xs) =>
      val ordered = xs.sortBy(_._2)
      // split on gap >= 4h (Spark's session end is exclusive)
      val sessions = ordered.tail.foldLeft(Vector(Vector(ordered.head))) { (acc, e) =>
        if (e._2 - acc.last.last._2 >= GapUs) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
      u -> ((sessions.size.toLong, xs.size.toLong,
        sessions.map(_.size).max.toLong,
        sessions.map(s => s.last._2 - s.head._2).max / 1000000L,
        rnd2(xs.map(_._3).sum)))
    }
    val got = SparkEntry.queries("q198_stream_sessions")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (ns, ne, mx, dur, v)) =>
      val (ens, ene, emx, edur, ev) = expected(u)
      assert((ns, ne, mx, dur) == ((ens, ene, emx, edur)), s"user $u")
      // the value sum's addition order differs (partial aggregation vs a
      // sequential fold) — exact to the cent up to one last-ulp flip
      assert(math.abs(v - ev) < 0.011, s"user $u value $v vs $ev")
    }
    // sessionization is non-degenerate on this corpus: somebody chains
    assert(got.exists(_._2._3 > 1L), "degenerate: every session is a single event")
  }

  test("q194 KS length drift matches an independent ECDF recomputation") {
    val rows = Tables(spark, sf).documents.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nAll = rows.length.toLong
    val lens = rows.map(_._2).distinct.sorted
    val cumAll = lens.map(l => l -> rows.count(_._2 <= l).toLong).toMap
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val nSrc = xs.length.toLong
      val nRest = nAll - nSrc
      val pts = lens.map { l =>
        val cumSrc = xs.count(_._2 <= l).toLong
        val num = cumSrc * nRest - (cumAll(l) - cumSrc) * nSrc
        (math.abs(num), l, num.sign)
      }
      // argmax by (absdiff, len) — the packed-string pick's order
      val (d, at, sgn) = pts.maxBy { case (a, l, _) => (a, l) }
      (src, nSrc, hdiv(1000000L * d, nSrc * nRest), at, sgn.toLong)
    }.toSet
    def run() = SparkEntry.queries("q194_ks_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val got = run()
    assert(got == expected)
    spark.conf.set("graft.ks.decimal", "true")
    try assert(run() == expected, "decimal-guarded q194 diverges")
    finally spark.conf.unset("graft.ks.decimal")
    // D is a probability gap: within [0, 1e6]; a zero D has sign 0
    got.foreach { case (src, _, d, _, sgn) =>
      assert(d >= 0L && d <= 1000000L, src)
      if (d == 0L) assert(sgn == 0L, src)
    }
  }

  test("q192 catalog fan-out profile matches an independent recomputation") {
    val t = Tables(spark, sf)
    val regions = t.region.select(col("r_regionkey").cast("long")).collect().map(_.getLong(0))
    val nations = t.nation.select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custNation = t.customer.select(col("c_nationkey").cast("long")).collect().map(_.getLong(0))
    def profile(depth: Int, parents: Seq[Long], childParents: Seq[Long]) = {
      val byP = childParents.groupBy(identity).view.mapValues(_.size.toLong)
      val fans = parents.map(p => byP.getOrElse(p, 0L))
      val (n, total) = (parents.size.toLong, fans.sum)
      (depth, n, total, fans.min, fans.max,
        hdiv(100L * total, n), hdiv(10000L * fans.max * n, total),
        fans.count(_ == 0L).toLong)
    }
    val expected = Set(
      profile(1, regions.toSeq, nations.map(_._2).toSeq),
      profile(2, nations.map(_._1).toSeq, custNation.toSeq))
    val got = SparkEntry.queries("q192_catalog_fanout")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // conservation against q27's tree: each level's children count is
    // exactly the node count q27 emits at that depth
    val q27ByDepth = SparkEntry.queries("q27_catalog_tree")(spark, sf).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.length.toLong)
    got.foreach { case (d, _, children, _, _, _, _, _) =>
      assert(children == q27ByDepth(d), s"depth $d children != q27 nodes")
    }
  }

  test("q193 Davies-Bouldin worst partners match an independent recomputation") {
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").longValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(v => math.floor(v.toDouble * 1000).toLong))
    }
    val cents = vecs.groupBy(_._2).map { case (l, xs) =>
      l -> (Array.tabulate(xs.head._3.length)(d => xs.map(_._3(d)).sum), xs.size.toLong)
    }
    def ownNum(q: Array[Long], c: (Array[Long], Long)): Long = {
      val (sq, cnt) = c
      var n = 0L
      var i = 0
      while (i < q.length) { val df = q(i) * cnt - sq(i); n += df * df; i += 1 }
      n
    }
    val scatter = vecs.groupBy(_._2).map { case (l, xs) =>
      val (n, cnt) = (xs.size.toLong, cents(l)._2)
      l -> (n, hdiv(xs.map(v => ownNum(v._3, cents(l))).sum, n * cnt * cnt))
    }
    def gap(a: Long, b: Long): Long = {
      val ((sqa, ca), (sqb, cb)) = (cents(a), cents(b))
      var d = 0L
      var i = 0
      while (i < sqa.length) { val df = sqa(i) * cb - sqb(i) * ca; d += df * df; i += 1 }
      hdiv(d, ca * cb * ca * cb)
    }
    val labels = cents.keys.toSeq.sorted
    val expected = labels.map { a =>
      val (ra, lb) = labels.filter(_ != a)
        .map(b => (hdiv(10000L * (scatter(a)._2 + scatter(b)._2), gap(a, b)), b))
        .maxBy { case (r, b) => (r, b) }
      (a, scatter(a)._1, scatter(a)._2, lb, ra)
    }.toSet
    def run() = SparkEntry.queries("q193_davies_bouldin")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL guard changes nothing at current scale (q191's conf —
    // one knob for the cell family)
    spark.conf.set("graft.cell.decimal", "true")
    try assert(run() == expected, "decimal-guarded q193 diverges")
    finally spark.conf.unset("graft.cell.decimal")
    // worst-partner is never self, and R >> 0 exactly when cells overlap
    got.foreach { case (l, _, _, worst, r) =>
      assert(worst != l && r > 0L, s"cell $l")
    }
  }

  test("q244 Calinski-Harabasz matches an independent global-centroid recomputation") {
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").longValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(v => math.floor(v.toDouble * 1000).toLong))
    }
    val cents = vecs.groupBy(_._2).map { case (l, xs) =>
      l -> (Array.tabulate(xs.head._3.length)(d => xs.map(_._3(d)).sum), xs.size.toLong)
    }
    val dims = vecs.head._3.length
    val n = vecs.length.toLong
    val k = cents.size.toLong
    val gsq = Array.tabulate(dims)(d => cents.values.map(_._1(d)).sum)
    def ownNum(q: Array[Long], c: (Array[Long], Long)): Long = {
      val (sq, cnt) = c
      var s = 0L
      var i = 0
      while (i < q.length) { val df = q(i) * cnt - sq(i); s += df * df; i += 1 }
      s
    }
    val perCell = cents.map { case (l, (sq, cnt)) =>
      val dd2 = (0 until dims).map { d =>
        val dd = hdiv(sq(d) * n - gsq(d) * cnt + cnt * n * 100000L, cnt * n) - 100000L
        dd * dd
      }.sum
      val within = hdiv(vecs.filter(_._2 == l).map(v => ownNum(v._3, cents(l))).sum, cnt * cnt)
      (l, cnt, within, cnt * dd2)
    }
    val bsum = BigInt(perCell.map(_._4).sum)
    val wsum = BigInt(perCell.map(_._3).sum)
    val den = 2 * wsum * BigInt(math.max(k - 1, 1))
    val ch = ((2 * BigInt(10000) * bsum * BigInt(n - k) + wsum * BigInt(math.max(k - 1, 1))) / den).toLong
    val expected = perCell.map { case (l, cnt, w, b) => (l, cnt, w, b, ch) }.toSet
    def run() = SparkEntry.queries("q244_calinski_harabasz")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL(38,0) guard on the within fold changes nothing at
    // current scale (graft.cell.decimal — one knob for the cell family)
    spark.conf.set("graft.cell.decimal", "true")
    try assert(run() == expected, "decimal-guarded q244 diverges")
    finally spark.conf.unset("graft.cell.decimal")
    // store-backed centroids reproduce the derived audit (q191's seam)
    val dir = java.nio.file.Files.createTempDirectory("graft_q244_ivf").toString
    val (assign, centroids) = graft.operators.Similarity.corpusQuantizer(Tables(spark, sf))
    graft.sources.IvfIndex.init(spark, dir, assign, centroids)
    spark.conf.set("graft.ivf.index", dir)
    try assert(run() == expected, "store-backed q244 diverges")
    finally spark.conf.unset("graft.ivf.index")
    // the ratio is a positive finite statistic; on these near-shell
    // embeddings it sits near 1 (0.9921 at sf0.001 — B and W the same
    // order), which is exactly the marginal-clustering regime the three
    // validity indices exist to disagree about
    assert(ch > 0L, s"CH ratio not positive (ch_e4=$ch)")
    got.foreach { case (l, cnt, w, b, _) =>
      assert(cnt > 0 && w > 0 && b >= 0, s"cell $l")
    }
  }

  test("q191 cell outliers match an independent own-centroid recomputation") {
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(v => math.floor(v.toDouble * 1000).toLong))
    }
    val cents = vecs.groupBy(_._2).map { case (l, xs) =>
      l -> (Array.tabulate(xs.head._3.length)(d => xs.map(_._3(d)).sum), xs.size.toLong)
    }
    def num(q: Array[Long], c: (Array[Long], Long)): Long = {
      val (sq, cnt) = c
      var n = 0L
      var i = 0
      while (i < q.length) { val df = q(i) * cnt - sq(i); n += df * df; i += 1 }
      n
    }
    val expected = vecs.groupBy(_._2).map { case (l, xs) =>
      val nums = xs.map(v => num(v._3, cents(l)))
      val (n, cnt) = (xs.size.toLong, cents(l)._2)
      val total = nums.sum
      (l, n,
        hdiv(10000L * total, n * cnt * cnt),
        hdiv(10000L * nums.max, cnt * cnt),
        hdiv(10000L * nums.max * n, total),
        nums.count(x => 100 * x * n > 102 * total).toLong,
        nums.count(x => 100 * x * n > 105 * total).toLong)
    }.toSet
    def run() = SparkEntry.queries("q191_cell_outliers")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL(38,0) overflow guard changes nothing at current scale
    spark.conf.set("graft.cell.decimal", "true")
    try assert(run() == expected, "decimal-guarded q191 diverges")
    finally spark.conf.unset("graft.cell.decimal")
    // store-backed centroids (graft.ivf.index — the relation IvfIndex
    // persists is exactly centroidsOf's) reproduce the derived audit
    val dir = java.nio.file.Files.createTempDirectory("graft_q191_ivf").toString
    val (assign, centroids) = graft.operators.Similarity.corpusQuantizer(Tables(spark, sf))
    graft.sources.IvfIndex.init(spark, dir, assign, centroids)
    spark.conf.set("graft.ivf.index", dir)
    try assert(run() == expected, "store-backed q191 diverges")
    finally spark.conf.unset("graft.ivf.index")
    // the 105 band nests in the 102 band, both sit within the census,
    // and the spread ratio is ≥ 1 (max ≥ mean) exactly
    got.foreach { case (l, n, _, _, spread, t102, t105) =>
      assert(t105 <= t102 && t102 <= n, s"cell $l")
      assert(spread >= 10000L, s"cell $l spread < 1")
    }
    // the bands are non-trivial on this corpus (probed: 102 separates
    // at every SF) — a silently-degenerate census would pass equality
    assert(got.exists(_._6 > 0L), "degenerate: no 102%-band tail in any cell")
  }

  test("q157 STAC extent matches an independent bbox + interval recomputation") {
    def rnd3(x: Double) =
      BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = Tables(spark, sf)
    val perCust = t.orders.select(col("o_custkey"), col("o_orderdate")).collect()
      .map(r => (r.getLong(0), r.get(1)))
      .groupBy(_._1)
    val nations = t.nation.select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getAs[Number](0).intValue, r.getString(1))).toMap
    val cust = t.customer.select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue))
    implicit val anyOrd: Ordering[Any] = Ordering.by(_.toString)
    val expected = cust.collect { case (ck, nk) if perCust.contains(ck) =>
      val lon = ((ck * 7919) % 360000).toDouble / 1000 - 180
      val lat = ((ck * 104729) % 170000).toDouble / 1000 - 85
      val ds = perCust(ck).map(_._2)
      (nk, lon, lat, ds.size.toLong, ds.min, ds.max)
    }.groupBy(_._1).map { case (nk, xs) =>
      (nations(nk), xs.size.toLong, xs.map(_._4).sum,
        rnd3(xs.map(_._2).min), rnd3(xs.map(_._2).max),
        rnd3(xs.map(_._3).min), rnd3(xs.map(_._3).max),
        xs.map(_._5).min, xs.map(_._6).max)
    }.toSet
    val got = SparkEntry.queries("q157_stac_extent")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.get(7), r.get(8)))
      .toSet
    assert(got == expected)
    // a bbox is well-formed and inside the world envelope; intervals are
    // ordered
    got.foreach { case (c, ni, na, lo, hi, la, ha, _, _) =>
      assert(ni >= 1 && na >= ni, c)
      assert(lo <= hi && la <= ha, c)
      assert(lo >= -180 && hi < 180 && la >= -85 && ha < 85, c)
    }
  }

  test("q162 basket pairs match an independent co-occurrence recomputation") {
    val items = Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).sorted }
    val pairCnt = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect { case (p, xs) if xs.size >= 2 => p -> xs.size.toLong }
    val marg = items.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val nOrders = byOrder.size.toLong
    val expected = pairCnt.toSeq.map { case ((p1, p2), np) =>
      (p1, p2, np, marg(p1), marg(p2), hdiv(10000L * np * nOrders, marg(p1) * marg(p2)))
    }.sortBy { case (p1, p2, np, _, _, _) => (-np, p1, p2) }.take(25)
    val got = SparkEntry.queries("q162_basket_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    // support never exceeds either marginal; lift is positive, and for
    // pairs this frequent, far above the independence floor of 0
    got.foreach { case (p1, p2, np, n1, n2, lift) =>
      assert(np <= math.min(n1, n2), s"$p1/$p2")
      assert(lift > 0, s"$p1/$p2")
    }
  }

  test("q165 length PSI matches an independent smoothed-histogram recomputation") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val rows = Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val binned = rows.map { case (id, nc) =>
      val b = bucket(id)
      val split = if (b < 90) "train" else if (b < 95) "val" else "test"
      (split, math.min(nc / 100, 9L))
    }
    val bins = binned.map(_._2).distinct.sorted
    val nBins = bins.size.toLong
    def cnt(s: String) = binned.filter(_._1 == s).groupBy(_._2)
      .map { case (b, xs) => b -> xs.size.toLong }
    val tot = Map("train" -> binned.count(_._1 == "train").toLong,
      "val" -> binned.count(_._1 == "val").toLong,
      "test" -> binned.count(_._1 == "test").toLong)
    val expected = Seq(("train", "val"), ("train", "test"), ("val", "test")).map {
      case (a, b) =>
        val (ca, cb) = (cnt(a), cnt(b))
        val (na, nb) = (tot(a) + nBins, tot(b) + nBins)
        val terms = bins.map { bin =>
          val (x, y) = (ca.getOrElse(bin, 0L) + 1, cb.getOrElse(bin, 0L) + 1)
          bin -> math.floor(
            (x.toDouble / na - y.toDouble / nb) *
              math.log(x.toDouble * nb / (y.toDouble * na)) * 1000000 + 0.5).toLong
        }
        val psi = terms.map(_._2).sum
        val worst = terms.maxBy { case (bin, t) => (t, bin.toString) }._1
        val verdict =
          if (psi < 100000) "stable" else if (psi < 250000) "moderate" else "shifted"
        (a, b, nBins, na, nb, psi, worst, verdict)
    }.toSet
    val got = SparkEntry.queries("q165_length_psi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toSet
    assert(got == expected)
    // every smoothed term is ≥ 0 ((p−q) and ln(p/q) share sign), so PSI
    // is too; an unbiased hash split over one generator should read
    // stable, which is the point of auditing it
    got.foreach { case (a, b, _, _, _, psi, _, _) => assert(psi >= 0, s"$a/$b") }
  }

  test("q166 event transitions match an independent Markov recomputation") {
    val evs = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.groupBy(x => x).map { case (k, xs) => k -> xs.size.toLong }
    val expected = trans.toSeq.groupBy(_._1._1).map { case (prev, xs) =>
      val nFrom = xs.map(_._2).sum
      val wsum = xs.map { case ((_, next), n) =>
        n * math.floor(-(math.log(n.toDouble / nFrom) / math.log(2.0)) * 1000 + 0.5).toLong
      }.sum
      val (modalNext, modalN) = xs.map { case ((_, next), n) => (next, n) }
        .maxBy { case (next, n) => (n, next) }
      (prev, nFrom, xs.size.toLong, hdiv(wsum, nFrom), modalNext, modalN,
        hdiv(10000L * modalN, nFrom))
    }.toSet
    val got = SparkEntry.queries("q166_event_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // entropy bounded by log2(successors); the modal share floor is the
    // uniform 1/k
    got.foreach { case (prev, nf, ns, h, _, mn, share) =>
      assert(h >= 0 && h <= math.ceil(math.log(ns.toDouble) / math.log(2.0) * 1000).toLong + ns, prev)
      assert(mn <= nf && share * ns >= 10000 - ns, prev)
    }
  }
  test("q170 NN margins match an independent within-cell top-2 recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val expected = vecs.groupBy(_._2).flatMap { case (cell, xs) =>
      val margins = xs.toSeq.flatMap { case (src, _, vs) =>
        val sims = xs.toSeq.filter(_._1 != src)
          .map { case (dst, _, vd) => (rnd6(cos(vs, vd)), dst) }
          .sortBy { case (sim, dst) => (-sim, dst) }
        if (sims.size < 2) None
        else Some(math.floor((sims(0)._1 - sims(1)._1) * 1000000 + 0.5).toLong)
      }
      if (margins.isEmpty) None
      else Some((cell, margins.size.toLong, hdiv(margins.sum, margins.size.toLong),
        margins.count(_ < 1000L).toLong, margins.max))
    }.toSet
    val got = SparkEntry.queries("q170_ann_margin")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // margins are gaps between a sorted pair: never negative, and the
    // mean never exceeds the max
    got.foreach { case (cell, n, mean, amb, mx) =>
      assert(mean >= 0 && mean <= mx, s"cell $cell")
      assert(amb <= n, s"cell $cell")
    }
  }

  test("q173 supplier HHI matches an independent recomputation, decimal path identical") {
    val t = Tables(spark, sf)
    val nationOf = t.supplier.select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("s_nationkey").intValue).toMap
    val names = t.nation.select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number]("n_nationkey").intValue -> r.getString(1)).toMap
    val counts = t.lineitem.select(col("l_suppkey")).collect()
      .map(_.getLong(0)).groupBy(identity)
      .map { case (sk, xs) => (nationOf(sk), sk) -> xs.length.toLong }
    val expected = counts.groupBy(_._1._1).map { case (nk, per) =>
      val cs = per.values.toSeq
      val tot = cs.sum
      (names(nk), cs.size.toLong, tot,
        hdiv(1000000L * cs.map(c => c * c).sum, tot * tot),
        hdiv(10000L * cs.max, tot))
    }.toSet
    def run() = SparkEntry.queries("q173_supplier_hhi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val got = run()
    assert(got == expected)
    // the DECIMAL(38,0) overflow-guard path is plan-shape-identical and
    // value-identical at current scale (q163's guard pattern)
    spark.conf.set("graft.hhi.decimal", "true")
    try assert(run() == got)
    finally spark.conf.unset("graft.hhi.decimal")
    // HHI is bounded below by the balanced pool 1e6/n and above by 1e6;
    // the top share is consistent with concentration
    got.foreach { case (nation, n, _, hhi, top) =>
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, nation)
      assert(top >= 10000L / n - 1 && top <= 10000L, nation)
    }
  }

  test("q174 intrinsic dimension matches an independent TwoNN recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getAs[Number]("label").intValue,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val expected = vecs.groupBy(_._2).flatMap { case (cell, xs) =>
      val terms = xs.toSeq.flatMap { case (src, _, vs) =>
        val sims = xs.toSeq.filter(_._1 != src)
          .map { case (dst, _, vd) => (rnd6(cos(vs, vd)), dst) }
          .sortBy { case (sim, dst) => (-sim, dst) }
        if (sims.size < 2) None
        else {
          val (s1, s2) = (sims(0)._1, sims(1)._1)
          if (s1 >= 1.0) Some(Left(()))
          else Some(Right(
            math.floor(math.log((1.0 - s2) / (1.0 - s1)) * 1000000 + 0.5).toLong))
        }
      }
      val lns = terms.collect { case Right(v) => v }
      val nDeg = terms.count(_.isLeft).toLong
      if (terms.isEmpty) None
      else {
        val sum = lns.sum
        Some((cell, lns.size.toLong, nDeg, sum,
          if (sum == 0) 0L else hdiv(1000L * 1000000L * lns.size, sum)))
      }
    }.toSet
    val got = SparkEntry.queries("q174_intrinsic_dim")(spark, sf).collect()
      .map(r => (r.getAs[Number]("label").intValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // ln mu >= 0 per vector, so the sum is non-negative and the estimate
    // positive whenever any vector has a genuine gap
    got.foreach { case (cell, n, _, sum, id) =>
      assert(sum >= 0, s"cell $cell")
      assert(id >= 0, s"cell $cell")
      assert(n >= 1, s"cell $cell")
    }
  }

  test("q175 l-diversity matches an independent combo recomputation") {
    val kRe = """"k":\s*(-?\d+)""".r
    val rows = Tables(spark, sf).events
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"),
        col("user_id"), col("props"))
      .collect()
      .filter(!_.isNullAt(3))
      .map { r =>
        val us = r.getLong(1)
        val hod = (us / 3600000000L) % 24
        val band = math.floor(r.getDouble(2) / 50).toLong
        val sens = kRe.findFirstMatchIn(r.getString(4)).map(_.group(1).toLong / 25)
        (r.getString(0), hod, band, r.getLong(3), sens)
      }
    val expected = rows.groupBy(x => (x._1, x._2, x._3)).map { case ((et, _, _), xs) =>
      (et, xs.length.toLong, xs.map(_._4).distinct.length.toLong,
        xs.map(_._5).distinct.length.toLong)
    }.toSeq.filter(_._3 >= 5).groupBy(_._1).map { case (et, combos) =>
      (et, combos.size.toLong,
        combos.count(_._4 < 3).toLong,
        combos.filter(_._4 < 3).map(_._2).sum,
        combos.map(_._4).min)
    }.toSet
    val got = SparkEntry.queries("q175_l_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
  }

  test("q176 detects crafted orphans and reports zero on the clean corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q176_crafted").toString
    Seq((1L, "A")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1L), (2L, 99L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 42L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 5L, 7L), (99L, 5L, 8L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(Tuple1(5L)).toDF("p_partkey").write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((7L, 1L), (8L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val crafted = SparkEntry.queries("q176_fk_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(crafted("customer->nation") == ((2L, 1L, 500000L)))
    assert(crafted("lineitem->orders") == ((2L, 1L, 500000L)))
    assert(crafted("lineitem->part") == ((2L, 0L, 0L)))
    assert(crafted("lineitem->supplier") == ((2L, 0L, 0L)))
    assert(crafted("orders->customer") == ((2L, 1L, 500000L)))
    assert(crafted("supplier->nation") == ((2L, 0L, 0L)))
    // the synthetic corpus is referentially clean — all six shares zero
    val clean = SparkEntry.queries("q176_fk_audit")(spark, sf).collect()
    assert(clean.length == 6)
    clean.foreach(r => assert(r.getLong(2) == 0L && r.getLong(3) == 0L, r.getString(0)))
  }

  test("q178 session entropy matches an independent per-user recomputation") {
    val rows = Tables(spark, sf).events
      .select(col("user_id"), col("event_type")).collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getString(1)))
    // .toSeq BEFORE the map: mapping a Map to (n, entropy) pairs would
    // re-key by n_events and silently collapse users sharing a count
    val expected = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      val n = xs.length.toLong
      val byType = xs.groupBy(_._2).map(_._2.length.toLong)
      val bitsSum = byType.map { c =>
        c * math.floor(-(math.log(c.toDouble / n) / math.log(2.0)) * 1000 + 0.5).toLong
      }.sum
      (n, hdiv(bitsSum, n))
    }.toSeq.groupBy { case (_, e) => math.min(e / 250, 9L) }.map { case (bin, us) =>
      (bin, us.size.toLong, us.map(_._1).sum, hdiv(100L * us.map(_._1).sum, us.size.toLong))
    }.toSet
    val got = SparkEntry.queries("q178_session_entropy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // entropy of a |types|-way mix caps at log2(|types|) ~ 2.33 bits:
    // every bin index stays under 10 and user counts conserve
    assert(got.toSeq.map(_._2).sum == rows.map(_._1).distinct.length.toLong)
  }

  test("q190 second-order transitions match an independent trigram recomputation") {
    val evs = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tri = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(3).collect {
        case Seq(a, b, c) => (a, b, c)
      }
    }.groupBy(x => x).map { case (k, xs) => k -> xs.size.toLong }
    def entropyE3(dist: Seq[Long]): Long = {
      val nFrom = dist.sum
      val wsum = dist.map { n =>
        n * math.floor(-(math.log(n.toDouble / nFrom) / math.log(2.0)) * 1000 + 0.5).toLong
      }.sum
      hdiv(wsum, nFrom)
    }
    // first-order reference = the trigram marginal (same event subset)
    val h1 = tri.toSeq.groupBy(_._1._2).map { case (p1, xs) =>
      p1 -> entropyE3(xs.groupBy(_._1._3).map(_._2.map(_._2).sum).toSeq)
    }
    val expected = tri.toSeq.groupBy(t => (t._1._1, t._1._2)).map { case ((p2, p1), xs) =>
      val nFrom = xs.map(_._2).sum
      val (modalNext, modalN) = xs.map { case ((_, _, next), n) => (next, n) }
        .maxBy { case (next, n) => (n, next) }
      val h2 = entropyE3(xs.map(_._2))
      (p2, p1, nFrom, xs.size.toLong, h2, modalNext, modalN,
        hdiv(10000L * modalN, nFrom), h1(p1) - h2)
    }.toSet
    val got = SparkEntry.queries("q190_transitions2")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSet
    assert(got == expected)
    // per-context counts conserve onto the first-order marginal, and a
    // one-successor context has exactly zero entropy
    val byP1 = got.toSeq.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val m1 = tri.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    assert(byP1.toMap == m1.toMap)
    got.filter(_._4 == 1L).foreach { r => assert(r._5 == 0L, r) }
  }

  test("q181 bloom calibration matches an independent bit-array simulation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(text: String): Long = {
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val configs = Seq((4096, 2), (16384, 3), (65536, 5))
    def pos(h: Long, i: Int, m: Int): Long = ((h * (2 * i + 1) + 7919L * i) % 2147483647L) % m
    // the base/incoming split is q107's (graft.delta.incoming default):
    // members = base corpus, probes = the arriving batch minus members
    val ds = Tables(spark, sf).documents.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0).startsWith("src1"), hv(r.getString(1))))
    val members = ds.filterNot(_._1).map(_._2).distinct
    val probes = ds.filter(_._1).map(_._2).distinct.filterNot(members.toSet)
    val expected = configs.map { case (m, k) =>
      val bits = members.flatMap(h => (0 until k).map(pos(h, _, m))).distinct
      val bitSet = bits.toSet
      val fps = probes.count(h => (0 until k).forall(i => bitSet(pos(h, i, m)))).toLong
      (m.toLong, k.toLong, members.length.toLong, bits.length.toLong,
        hdiv(1000000L * bits.length, m.toLong), probes.length.toLong, fps,
        hdiv(1000000L * fps, probes.length.toLong))
    }.toSet
    val got = SparkEntry.queries("q181_bloom_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // a bigger, more-hashed filter never has a WORSE false-positive rate
    // on the same member/probe sets (monotone in this sweep's configs)
    val byM = got.toSeq.sortBy(_._1).map(_._8)
    byM.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"fpr not monotone: $byM")
      case _         =>
    }
  }

  test("q182 join skew matches an independent multiplicity recomputation") {
    def pctl(sorted: Seq[Long], p: Double): Double = {
      val posn = p * (sorted.length - 1)
      val lo = posn.toInt
      val frac = posn - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo).toDouble
    }
    def rnd2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = Tables(spark, sf)
    def branch(name: String, keys: Seq[Long]) = {
      val mult = keys.groupBy(identity).map(_._2.length.toLong).toSeq.sorted
      val total = mult.sum
      (name, mult.size.toLong, total, mult.max, rnd2(pctl(mult, 0.99)),
        hdiv(1000000L * mult.max, total))
    }
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val oc = t.orders.select(col("o_custkey")).collect().map(_.getLong(0))
    val expected = Set(
      branch("lineitem.l_orderkey", li.map(_._1)),
      branch("lineitem.l_partkey", li.map(_._2)),
      branch("lineitem.l_suppkey", li.map(_._3)),
      branch("orders.o_custkey", oc.toSeq))
    val got = SparkEntry.queries("q182_join_skew")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toSet
    assert(got == expected)
  }

  test("q184 PIT snapshot matches an independent as-of recomputation") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.map(_._3).min
    val t1 = ev.map(_._3).max
    val cutoffs = Seq(t0 + (t1 - t0) / 4, t0 + (t1 - t0) / 2, t0 + 3 * ((t1 - t0) / 4))
    val expected = cutoffs.flatMap { c =>
      val last = ev.filter(_._3 < c).groupBy(_._1).map { case (_, xs) =>
        xs.maxBy(x => (x._3, x._2))._2
      }.toSeq
      val total = last.size.toLong
      last.groupBy(identity).map { case (tp, xs) =>
        (c, tp, xs.size.toLong, hdiv(10000L * xs.size, total))
      }
    }.toSet
    val got = SparkEntry.queries("q184_pit_snapshot")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // a later cutoff never sees fewer users with history
    val users = got.toSeq.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._3).sum }
    users.toSeq.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a)
      case _         =>
    }
  }

  test("q189 retention sweep matches an independent recomputation and q85 at keep=3") {
    def rnd2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ranked = ev.groupBy(_._1).values.flatMap { xs =>
      xs.sortBy(x => (-x._3, -x._2)).zipWithIndex
        .map { case (x, i) => (x._1, x._4, (i + 1).toLong) }
    }.toSeq
    val expected = Seq(1L, 3L, 5L).map { keep =>
      val gc = ranked.filter(_._3 > keep)
      (keep, gc.map(_._1).distinct.size.toLong, gc.size.toLong,
        rnd2(gc.map(_._2).sum))
    }.toSet
    val got = SparkEntry.queries("q189_retention_sweep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    // consistency with the executed policy: keep=3's version total equals
    // q85's per-dataset reclaim summed
    val q85 = SparkEntry.queries("q85_retention_gc")(spark, sf).collect()
    val q85Versions = q85.map(_.getAs[Long]("n_gc_versions")).sum
    assert(got.find(_._1 == 3L).get._3 == q85Versions)
  }

  test("q213 type mismatch matches a direct declared-vs-sniffed census") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def mod3(n: Long) = n % 3 match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    val rows = docs.map { case (id, src, text) =>
      (src, mod3(id), mod3(text.head.toLong))
    }
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val mism = xs.filter(x => x._2 != x._3)
      val worst = mism.groupBy(x => (x._2, x._3)).toSeq
        .map { case ((d, s0), ys) => (ys.length.toLong, s"$d->$s0") }
        .maxBy { case (c, lbl) => (c, lbl) }
      (src, xs.length.toLong, mism.length.toLong,
        hdiv(10000L * mism.length, xs.length.toLong), worst._2, worst._1)
    }.toSet
    val got = SparkEntry.queries("q213_type_mismatch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
      .toSet
    assert(got == expected)
    got.foreach { case (src, n, mm, share, _, topN) =>
      assert(mm <= n && topN <= mm && share >= 0L && share <= 10000L, src)
    }
  }

  test("q214 nation trade matches a direct multi-join recomputation") {
    val t = Tables(spark, sf)
    val nation = t.nation.select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val cust = t.customer.select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val supp = t.supplier.select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ordCust = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val lines = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * (1 - r.getDouble(3)) * 100 + 0.5).toLong))
    val pairs = lines.flatMap { case (ok, sk, rev) =>
      for {
        ck <- ordCust.get(ok)
        cn <- cust.get(ck).flatMap(nation.get)
        sn <- supp.get(sk).flatMap(nation.get)
        if cn != sn
      } yield ((cn, sn), rev)
    }
    val expected = pairs.groupBy(_._1).toSeq
      .map { case ((cn, sn), xs) => (cn, sn, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy { case (cn, sn, _, rev) => (-rev, cn, sn) }
      .take(20)
    val got = SparkEntry.queries("q214_nation_trade")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // cross-nation only, ordered by revenue
    assert(got.forall { case (cn, sn, _, _) => cn != sn })
    assert(got.map(_._4).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("q208 order reconciliation matches a direct header-vs-lines recomputation") {
    val t = Tables(spark, sf)
    val sums = t.lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_tax"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * (1 + r.getDouble(2)) * (1 - r.getDouble(3)) * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val orders = t.orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expected = orders.groupBy(_._2).map { case (st, os) =>
      val withS = os.map(o => (o._3, sums.get(o._1)))
      val backed = withS.collect { case (tp, Some(s)) => (tp, s) }
      val ratios = backed.map { case (tp, s) => hdiv(10000L * tp, s) }
      (st, os.length.toLong, withS.count(_._2.isEmpty).toLong,
        backed.count { case (tp, s) => 2 * tp < s }.toLong,
        backed.count { case (tp, s) => tp > 2 * s }.toLong,
        backed.count { case (tp, s) => 2 * tp >= s && tp <= 2 * s }.toLong,
        ratios.min, ratios.max)
    }.toSet
    val got = SparkEntry.queries("q208_order_reconcile")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // the three ratio bands plus the no-lines class partition every order
    got.foreach { case (st, n, nl, u, ov, par, mn, mx) =>
      assert(nl + u + ov + par == n, st)
      assert(mn <= mx, st)
    }
  }

  test("q209 stationary flow matches an independent power-iteration recomputation") {
    val ev = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._4).toSeq
      s.zip(s.tail)
    }
    val m = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val states = trans.map(_._2).distinct.sorted
    val k = states.length.toLong
    var p: Map[String, Long] = states.map(_ -> 1000000L / k).toMap
    for (_ <- 1 to 3)
      p = states.map { j =>
        j -> m.toSeq.collect {
          case ((i, jj), c) if jj == j && p.contains(i) =>
            (2 * p(i) * c + r(i)) / (2 * r(i))
        }.sum
      }.toMap
    val tot = trans.length.toLong
    val expected = states.map { j =>
      val obs = hdiv(1000000L * trans.count(_._2 == j), tot)
      (j, obs, p(j), p(j) - obs)
    }.toSet
    val got = SparkEntry.queries("q209_stationary_flow")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // both distributions carry ~unit mass (per-term half-up rounding can
    // drift by at most a few e6 ulps per step) and deltas net out
    assert(math.abs(got.toSeq.map(_._3).sum - 1000000L) <= 100L)
    assert(math.abs(got.toSeq.map(_._4).sum) <= 200L)
  }

  test("q220 entropy rate composes q209's stationary with q166's entropies") {
    val ev = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._4).toSeq
      s.zip(s.tail)
    }
    val m = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val states = trans.map(_._2).distinct.sorted
    var p: Map[String, Long] = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 3)
      p = states.map { j =>
        j -> m.toSeq.collect {
          case ((i, jj), c) if jj == j && p.contains(i) =>
            (2 * p(i) * c + r(i)) / (2 * r(i))
        }.sum
      }.toMap
    val ent = trans.groupBy(_._1).map { case (prev, xs) =>
      val nFrom = xs.size.toLong
      val wsum = xs.groupBy(_._2).map { case (_, es) =>
        val n = es.size.toLong
        n * math.floor(-(math.log(n.toDouble / nFrom) / math.log(2.0)) * 1000 + 0.5).toLong
      }.sum
      prev -> hdiv(wsum, nFrom)
    }
    val expected = states.map { j =>
      val h = ent.getOrElse(j, 0L)
      (j, p(j), h, hdiv(p(j) * h, 1000000L))
    }.toSet
    val got = SparkEntry.queries("q220_markov_entropy_rate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // the chain's entropy rate (the contribution column sum) sits inside
    // the per-state entropy envelope, and its stationary weights must
    // tie to q209's output exactly
    val rate = got.toSeq.map(_._4).sum
    assert(rate > 0 && rate <= got.toSeq.map(_._3).max)
    val q209pi = SparkEntry.queries("q209_stationary_flow")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got.map(g => (g._1, g._2)) == q209pi)
  }

  test("q221 spectral mass matches an independent integer power iteration") {
    val vecs = Tables(spark, sf).embeddings.collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    val d = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000).toLong))
    val s = Array.tabulate(d, d)((i, j) => q.map(v => v(i) * v(j)).sum)
    val trace = (0 until d).map(i => s(i)(i)).sum
    def shdiv(a: Long, b: Long): Long = {
      val r = (2 * math.abs(a) + b) / (2 * b); if (a < 0) -r else r
    }
    var w = Array.fill(d)(1000000L)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => shdiv(s(i)(j) * w(j), trace)).sum)
      val m = u.map(math.abs).max
      w = u.map(x => shdiv(1000000L * x, m))
    }
    val rayNum = (for { i <- 0 until d; j <- 0 until d } yield BigInt(w(i)) * s(i)(j) * w(j)).sum
    val rayDen = (0 until d).map(i => BigInt(w(i)) * w(i)).sum * trace
    val rayShare = ((2 * BigInt(1000000) * rayNum + rayDen) / (2 * rayDen)).toLong
    val expected = (0 until d).map { i =>
      (i.toLong, s(i)(i), shdiv(1000000L * s(i)(i), trace), w(i), rayShare)
    }.toSet
    val got = SparkEntry.queries("q221_spectral_mass")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // the Rayleigh share must beat the isotropic 1/d floor (PSD matrix,
    // probed anisotropy), energy shares carry ~unit mass, and the
    // iterate is L-infinity normalized
    assert(rayShare > 1000000L / d, "degenerate: no anisotropy to read")
    assert(math.abs(got.toSeq.map(_._3).sum - 1000000L) <= d.toLong)
    assert(got.toSeq.map(x => math.abs(x._4)).max == 1000000L)
  }

  test("q224 lead times match an independent day-diff recomputation") {
    val t = Tables(spark, sf)
    val orders = t.orders
      .select(col("o_orderkey"), col("o_orderdate").cast("date"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
      .map(x => x._1 -> (x._2, x._3)).toMap
    val leads = t.lineitem
      .select(col("l_orderkey"), col("l_shipdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .collect { case (ok, ship) if orders.contains(ok) =>
        val (od, pri) = orders(ok)
        (pri, java.time.temporal.ChronoUnit.DAYS.between(od, ship))
      }
    val expected = leads.groupBy(_._1).map { case (pri, xs) =>
      val ls = xs.map(_._2).sorted
      val n = ls.length
      def pct(p: Int) = ls((p * n + 99) / 100 - 1)
      (pri, n.toLong, ls.count(_ < 0).toLong, hdiv(10000L * ls.count(_ < 0), n.toLong),
        pct(50), pct(95), ls.last)
    }.toSet
    val got = SparkEntry.queries("q224_lead_time")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // the temporal violation must actually be present on this generator
    // (probed ~49% at every SF) and percentiles must be ordered
    got.foreach { case (pri, n, neg, _, p50, p95, mx) =>
      assert(neg > 0 && neg < n, pri)
      assert(p50 <= p95 && p95 <= mx, pri)
    }
  }

  test("q226 sign-LSH calibration matches an independent sketch recomputation") {
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val d = vecs.head._2.length
    val bits = 8; val projs = 2
    def sketch(v: Array[Float]): Long =
      (0 until projs).map { p =>
        (0 until bits).map { i =>
          val dim = (p * bits + i) % d // 0-based index of the 1-based dim+1
          if (v(dim) >= 0) 1L << (bits - 1 - i) else 0L
        }.sum * (1L << ((projs - 1 - p) * bits))
      }.sum
    val sks = vecs.map { case (id, v) => (id, v, sketch(v)) }
    val qs = sks.filter(_._1 < 10)
    val rows = sks.flatMap { case (id, v, sk) =>
      qs.collect { case (qid, qv, qsk) if id != qid =>
        val h = java.lang.Long.bitCount(sk ^ qsk).toLong
        (h, math.floor(rnd6(cos(qv, v)) * 1000000 + 0.5).toLong)
      }
    }
    val expected = rows.groupBy(_._1).map { case (h, xs) =>
      val n = xs.length.toLong
      val mean = (2 * xs.map(_._2 + 1000000L).sum + n) / (2 * n) - 1000000L
      val theory = math.floor(math.cos(h.toDouble * math.Pi / (bits * projs)) * 1000000 + 0.5).toLong
      (h, n, mean, theory)
    }.toSet
    val got = SparkEntry.queries("q226_signlsh_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // the sketch must RANK: among well-populated buckets (n >= 50) the
    // mean cosine at the smallest h beats the mean at the largest h, and
    // the theory envelope sits above the measured curve below h = 8
    val pop = got.toSeq.filter(_._2 >= 50).sortBy(_._1)
    assert(pop.size >= 3, "degenerate: too few populated hamming buckets")
    assert(pop.head._3 > pop.last._3)
    pop.filter(_._1 < 8).foreach { case (h, _, mean, theory) =>
      assert(theory > mean, s"h=$h")
    }
  }

  test("q205 t-closeness matches an independent EMD recomputation") {
    val rows = Tables(spark, sf).events
      .filter(col("user_id").isNotNull)
      .select(
        col("event_type"), hour(col("ts")).cast("long"),
        expr("CAST(floor(value / 50) AS BIGINT)"), col("user_id"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) DIV 25"))
      .collect()
      .filter(!_.isNullAt(4))
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3), r.getLong(4)))
    val nAll = rows.length.toLong
    val dom = rows.map(_._3).distinct.sorted
    val m = dom.length.toLong
    val globCum = dom.map(sv => sv -> rows.count(_._3 <= sv).toLong).toMap
    val expected = rows.groupBy(_._1).toSeq
      .filter { case (_, xs) => xs.map(_._2).distinct.length >= 5 }
      .map { case (combo, xs) =>
        val n = xs.length.toLong
        val s = dom.map { sv =>
          val cumC = xs.count(_._3 <= sv).toLong
          math.abs(cumC * nAll - globCum(sv) * n)
        }.sum
        (combo._1, n, hdiv(1000000L * s, n * nAll * (m - 1)))
      }
      .groupBy(_._1)
      .map { case (tp, cs) =>
        (tp, cs.size.toLong, cs.count(_._3 >= 150000L).toLong,
          cs.filter(_._3 >= 150000L).map(_._2).sum, cs.map(_._3).max)
      }.toSet
    def run() = SparkEntry.queries("q205_t_closeness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val got = run()
    assert(got == expected)
    spark.conf.set("graft.t.decimal", "true")
    try assert(run() == expected, "decimal-guarded q205 diverges")
    finally spark.conf.unset("graft.t.decimal")
    // triad consistency: the k-anonymous combo base is exactly q175's
    // (the corpus has no null sensitive values, so the scopes coincide),
    // and t is a probability-scale distance
    val q175 = SparkEntry.queries("q175_l_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_anon_combos"))).toMap
    got.foreach { case (tp, nc, bc, _, mx) =>
      assert(q175(tp) == nc, s"$tp combo base != q175")
      assert(bc <= nc && mx >= 0L && mx <= 1000000L, tp)
    }
  }

  test("q206 chi-square independence audit matches an independent recomputation") {
    val docs = Tables(spark, sf).documents.select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val langs = docs.map(_._1).distinct.sorted
    val srcs = docs.map(_._2).distinct.sorted
    val df = (langs.length - 1).toLong * (srcs.length - 1).toLong
    val cellCount = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rM = langs.map(l => l -> docs.count(_._1 == l).toLong).toMap
    val cM = srcs.map(s0 => s0 -> docs.count(_._2 == s0).toLong).toMap
    val expected = langs.map { l =>
      val cells = srcs.map { s0 =>
        val o = cellCount.getOrElse((l, s0), 0L)
        val dnum = BigInt(o) * n - BigInt(rM(l)) * cM(s0)
        val den = BigInt(n) * rM(l) * cM(s0)
        ((((BigInt(2) * 10000 * dnum * dnum) + den) / (den * 2)).toLong, s0)
      }
      val (topC, topS) = cells.max
      (l, rM(l), srcs.length.toLong, cells.map(_._1).sum, topS, topC, df)
    }.toSet
    val got = SparkEntry.queries("q206_chi_square")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
    // every lang covers the full source grid; the top cell is part of the
    // row sum; the row masses cover the corpus
    got.foreach { case (l, _, nc, part, _, top, _) =>
      assert(nc == srcs.length.toLong && top <= part, l)
    }
    assert(got.toSeq.map(_._2).sum == n)
  }

  test("q207 FD violation audit matches an independent g3 recomputation") {
    val t = Tables(spark, sf)
    def fd(name: String, pairs: Seq[(Any, Any)]) = {
      val grp = pairs.groupBy(_._1)
      val nRows = pairs.length.toLong
      val viol = grp.count(_._2.map(_._2).distinct.length > 1).toLong
      val keep = grp.values.map(xs => xs.groupBy(_._2).values.map(_.length).max.toLong).sum
      (name, nRows, grp.size.toLong, viol, nRows - keep,
        hdiv(1000000L * (nRows - keep), nRows))
    }
    def pairs(rel: org.apache.spark.sql.DataFrame, a: String, b: String) =
      rel.select(col(a), col(b)).collect()
        .filter(!_.isNullAt(0)).map(r => (r.get(0), r.get(1))).toSeq
    val expected = Set(
      fd("customer.c_nationkey->c_mktsegment", pairs(t.customer, "c_nationkey", "c_mktsegment")),
      fd("documents.source->lang", pairs(t.documents, "source", "lang")),
      fd("events.user_id->event_type", pairs(t.events, "user_id", "event_type")),
      fd("lineitem.l_partkey->l_returnflag", pairs(t.lineitem, "l_partkey", "l_returnflag")),
      fd("orders.o_custkey->o_orderpriority", pairs(t.orders, "o_custkey", "o_orderpriority")),
      fd("part.p_brand->p_type", pairs(t.part, "p_brand", "p_type")))
    val got = SparkEntry.queries("q207_fd_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected)
    // g3 is a deletable-row share strictly below 1; groups violate iff
    // rows must be deleted
    got.foreach { case (nm, nr, nl, vl, vr, g3) =>
      assert(vl <= nl && vr < nr && g3 >= 0L && g3 < 1000000L, nm)
      assert((vl == 0L) == (vr == 0L), nm)
    }
  }

}
