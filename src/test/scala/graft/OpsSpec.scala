package graft

import org.apache.spark.sql.functions._
import graft.queries.OpsQueries

/** Pins for the ops family (q184–q188): association-rule arithmetic
  * and symmetry, the burst z-test recomputed independently, decay
  * monotonicity, percentile ordering and membership, and attribution
  * exclusivity. */
class OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q184: rules are capped per antecedent, support-symmetric, confidence-bounded") {
    val rows = OpsQueries.queries("q184_association_rules")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val byAnt = rows.groupBy(_.getLong(0))
    byAnt.values.foreach(rs => assert(rs.length <= 10))
    val pairSupport = rows.map(r =>
      (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))) -> r.getLong(4)).toMap
    rows.foreach { r =>
      val key = (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))
      assert(r.getLong(4) == pairSupport(key), "support must be symmetric")
      assert(r.getLong(4) >= 5L)
      assert(r.getLong(5) <= 1000000L, "confidence cannot exceed 1")
      val rank = r.getAs[Number](7).longValue
      assert(rank >= 1L && rank <= 10L)
    }
  }

  test("q185: flagged buckets satisfy the z-test against independently computed stats") {
    val e = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_millis(ts) div 3600000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (h0, h1) = (e.map(_._2).min, e.map(_._2).max)
    val flagged = OpsQueries.queries("q185_burst_detection")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    e.groupBy(_._1).foreach { case (tpe, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val xs = (h0 to h1).map(h => h -> counts.getOrElse(h, 0L))
      val n = xs.size.toLong
      val s = xs.map(_._2).sum
      val q = xs.map(x => x._2 * x._2).sum
      xs.foreach { case (h, x) =>
        val isBurst = x * n > s &&
          4 * (x * n - s) * (x * n - s) > 25 * (n * q - s * s)
        assert(flagged.contains((tpe, h)) == isBurst, s"($tpe, $h)")
        if (isBurst) assert(flagged((tpe, h)) == x)
      }
    }
  }

  test("q186: decayed never exceeds total; a fresh event at tmax decays by 0") {
    val rows = OpsQueries.queries("q186_decayed_reputation")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        "halving decay cannot increase value")
      assert(r.getLong(3) >= 0L)
    }
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.length == nUsers)
  }

  test("q187: percentiles are ordered and are observed latencies") {
    val rows = OpsQueries.queries("q187_latency_percentiles")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val lat = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lat"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byMon = lat.groupBy(_._1)
    rows.foreach { r =>
      val (mon, n, p50, p90, p99) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val ls = byMon(mon).map(_._2).sorted
      assert(n == ls.length)
      assert(p50 <= p90 && p90 <= p99)
      Seq(50 -> p50, 90 -> p90, 99 -> p99).foreach { case (p, v) =>
        assert(ls.contains(v), s"$mon p$p=$v not observed")
        // v is the smallest latency with rank coverage >= p%
        val cc = ls.count(_ <= v).toLong
        assert(100 * cc >= p * n)
        val below = ls.filter(_ < v)
        if (below.nonEmpty)
          assert(100 * below.count(_ <= below.max) < p * n ||
            below.max == v)
      }
    }
  }

  test("q189: classes partition parts in rank order; A closes at the 80% boundary") {
    val rows = OpsQueries.queries("q189_abc_pareto")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    // rank order is revenue-descending and classes are monotone A<=B<=C
    val sorted = rows.sortBy(_.getLong(2))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
      assert(a.getString(3) <= b.getString(3), "classes must be monotone")
    }
    // the first part AFTER the A block has cum_before >= 80% of total
    var cum = 0L
    sorted.foreach { r =>
      val expected = if (100 * cum < 80 * total) "A"
        else if (100 * cum < 95 * total) "B" else "C"
      assert(r.getString(3) == expected, s"rank ${r.getLong(2)}")
      cum += r.getLong(1)
    }
  }

  test("q190: the reported peak is the true max |CUSUM| over the dense day grid") {
    val e = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (d0, d1) = (e.map(_._2).min, e.map(_._2).max)
    val out = OpsQueries.queries("q190_cusum_changepoint")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    e.groupBy(_._1).foreach { case (tpe, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val xs = (d0 to d1).map(h => counts.getOrElse(h, 0L))
      val n = xs.size.toLong
      val s = xs.sum
      var cx = 0L
      var best = 0L; var bestDay = d0
      xs.zipWithIndex.foreach { case (x, i) =>
        cx += x
        val cusum = cx * n - (i + 1) * s
        if (math.abs(cusum) > best) { best = math.abs(cusum); bestDay = d0 + i }
      }
      assert(out(tpe) == ((n, best, bestDay)), tpe)
    }
  }

  test("q191: gini and top-share are bounded and consistent with distinct counts") {
    val rows = OpsQueries.queries("q191_gini_profile")(spark, dir).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val (n, d, top, gini) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(d >= 1 && top >= 1000000L / d && top <= 1000000L)
      assert(gini >= 0 && gini < 1000000L)
      // gini upper bound for d values: 1 - 1/d
      assert(gini <= 1000000L - 1000000L / d + 1)
      assert(n > 0)
    }
  }

  test("q192: flagged cells beat their own hour-of-day baseline, not the global one") {
    val rows = OpsQueries.queries("q192_seasonal_baseline")(spark, dir)
      .collect()
    rows.foreach { r =>
      val (cnt, n, s) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cnt * n > s, "flagged cell must exceed its seasonal mean")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 23)
    }
  }

  test("q205: cohorts partition signup users; converters bounded; percentiles ordered") {
    val rows = OpsQueries.queries("q205_funnel_latency")(spark, dir)
      .collect()
    val nSignupUsers = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nSignupUsers)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) > 0)
        assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(4))
      else
        assert(r.getLong(3) == -1L && r.getLong(4) == -1L)
    }
  }

  test("q193: paths cover every event exactly once; prefixes capped at 5") {
    val rows = OpsQueries.queries("q193_session_paths")(spark, dir).collect()
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nEvents,
      "sessions must partition the events")
    rows.foreach { r =>
      val path = r.getString(0)
      assert(path.split(">").length <= 5)
      assert(r.getLong(1) >= 1)
    }
  }

  test("q188: every purchase once; attributed gaps inside the window; -1s consistent") {
    val rows = OpsQueries.queries("q188_attribution")(spark, dir).collect()
    val nPurch = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type") === "purchase").count()
    assert(rows.length == nPurch)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val (clickId, gap) = (r.getLong(3), r.getLong(4))
      assert((clickId == -1L) == (gap == -1L))
      if (gap >= 0) assert(gap <= 604800000L)
    }
  }
  test("q209: dwell percentiles are ordered and transition mass is conserved") {
    val rows = OpsQueries.queries("q209_transition_dwell")(spark, dir)
      .collect()
    assert(rows.length == 25, "5x5 transition pairs on this fixture")
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers,
      "each user contributes (events - 1) transitions")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
  }

  test("q236: Fano moments match a driver recount; flag agrees with the ratio") {
    val rows = OpsQueries.queries("q236_overdispersion")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "unix_millis(CAST(ts AS TIMESTAMP))" +
        " div 86400000 AS d")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val counts = byType(t).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val xs = (d0 to d1).map(d => counts.getOrElse(d, 0L))
      val (n, s, q) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == q, t)
      assert(r.getLong(4) == 1000000L * (n * q - s * s) / (s * (n - 1)))
      assert(r.getBoolean(5) == (n * q - s * s > s * (n - 1)))
    }
  }

  test("q217: per-type chi2 equals the sum of its bin contributions; halves partition") {
    val rows = OpsQueries.queries("q217_chisq_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val chi = rs.head.getLong(7)
      assert(rs.forall(_.getLong(7) == chi), s"$t: chi2 not constant")
      assert(rs.map(_.getLong(6)).sum == chi, s"$t: contribs don't sum")
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(4),
        s"$t: c1 must sum to n1")
      assert(rs.map(_.getLong(3)).sum == rs.head.getLong(5),
        s"$t: c2 must sum to n2")
    }
  }

}
