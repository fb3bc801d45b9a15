package graft

import org.apache.spark.sql.functions._
import graft.queries.{GovernanceQueries, GraphQueries}

/** Pins for the governance family (q179–q183): the purged split's
  * partition/exclusivity invariants, k-anonymity's consistency
  * between cell and generalized verdicts, distinct-n bounds, the
  * histogram lower-median's defining property, and link prediction's
  * non-adjacency + score bounds. */
class GovernanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q179: every fold's test/train/purged counts partition the events") {
    val rows = GovernanceQueries.queries("q179_purged_split")(spark, dir)
      .collect()
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == nEvents,
        s"fold ${r.getLong(0)} does not partition")
    }
    // the test sets alone also partition the events (each event has
    // exactly one home fold)
    assert(rows.map(_.getLong(1)).sum == nEvents)
  }

  test("q180: cell populations roll up to the generalized group and to the table") {
    val df = GovernanceQueries.queries("q180_k_anonymity")(spark, dir)
    val rows = df.collect()
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    // verdicts are pure functions of the counts
    rows.foreach { r =>
      assert((r.getLong(3) < 4) == (r.getLong(4) == 1L))
      assert((r.getLong(5) < 4) == (r.getLong(6) == 1L))
    }
    // generalized population = sum of its member cells
    val bad = df.groupBy("c_nationkey", "c_mktsegment")
      .agg(sum("n").as("s"), max("n_gen").as("g"))
      .where(col("s") =!= col("g")).count()
    assert(bad == 0)
  }

  test("q181: distinct <= total, ppm consistent, and gram counts telescope") {
    val rows = GovernanceQueries.queries("q181_distinct_n")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, distinct, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(distinct <= total && ppm == 1000000L * distinct / total)
    }
    // per source: total (n+1)-grams = total n-grams - |docs with >= n+1
    // tokens| — pin the weaker monotone form (every doc loses at most
    // one gram going n -> n+1, none gains)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byN = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
      (1L to 2L).foreach { n =>
        if (byN.contains(n) && byN.contains(n + 1))
          assert(byN(n + 1) <= byN(n))
      }
    }
  }

  test("q182: per-source stats match an independent sorted-array median/MAD") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = GovernanceQueries.queries("q182_mad_outliers")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // reference statistics computed independently (sorted-array lower
    // median, not the engine's histogram path)
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.size - 1) / 2)
    val bySource = docs.groupBy(_._1)
    assert(out.keySet == bySource.keySet)
    bySource.foreach { case (src, ds) =>
      val ns = ds.map(_._2).toSeq
      val med = lowerMedian(ns)
      val devs = ns.map(n => math.abs(n - med))
      val mad = lowerMedian(devs)
      val expected = (ns.size.toLong, med, mad,
        devs.count(_ > 3 * mad).toLong, devs.max)
      assert(out(src) == expected, s"source $src")
    }
  }

  test("q203: orphan and coverage counts are internally consistent") {
    val rows = GovernanceQueries.queries("q203_fk_audit")(spark, dir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "orphans cannot exceed children")
      assert(r.getLong(4) <= r.getLong(3),
        "unreferenced parents cannot exceed parents")
    }
    // the fixture is referentially clean child->parent
    assert(rows.forall(_.getLong(2) == 0L))
    // but has unreferenced customers (events cover a user subset)
    val ev = rows.find(_.getString(0).startsWith("events")).get
    assert(ev.getLong(4) > 0L)
  }

  test("q204: sample shares sum like the full shares; drift is |sample - full|") {
    val rows = GovernanceQueries.queries("q204_sample_bias")(spark, dir)
      .collect()
    val dims = rows.groupBy(_.getString(0))
    assert(dims.keySet == Set("lang", "source"))
    dims.values.foreach { rs =>
      val tf = rs.map(_.getLong(2)).sum
      val ts = rs.map(_.getLong(3)).sum
      rs.foreach { r =>
        assert(r.getLong(4) == 1000000L * r.getLong(2) / tf)
        if (ts > 0)
          assert(r.getLong(6) ==
            math.abs(1000000L * r.getLong(3) / ts - r.getLong(4)))
      }
    }
  }

  test("q206: Lorenz curve is monotone to 1e6 and Gini matches a direct fold") {
    val rows = GovernanceQueries.queries("q206_source_skew")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.last.getLong(3) == 1000000L ||
      rows.last.getLong(3) == 999999L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) >= a.getLong(3)) }
    val toks = rows.map(_.getLong(2))
    val n = toks.length.toLong
    val tot = toks.sum
    val iws = toks.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = 1000000L * (2 * iws - (n + 1) * tot) / (n * tot)
    assert(rows.forall(_.getLong(4) == gini))
  }

  test("q183: candidates are non-adjacent distance-2 pairs with bounded scores") {
    val pairs = GraphQueries.queries("q183_link_prediction")(spark, dir)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (u, v, cn, jac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u < v && cn >= 2 && jac >= 0 && jac <= 1000000L)
    }
  }
  test("q210: shares sum to ~1e6 within each region and globally") {
    val rows = graft.SparkEntry.queries("q210_ratio_to_parent")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (region, rs) =>
      val t = rs.map(_.getLong(3)).sum
      assert(t <= 1000000L && t > 1000000L - rs.length, region)
    }
    val g = rows.map(_.getLong(4)).sum
    assert(g <= 1000000L && g > 1000000L - rows.length)
  }

  test("q211: SCD2 holds exactly one valid version per key at every probe") {
    val rows = graft.SparkEntry.queries("q211_asof_probe")(spark, dir)
      .collect()
    assert(rows.length == 5)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        "one valid version per key (snapshot consistency)")
    }
    // before the dimension existed: nothing valid; after the merge:
    // at least the original keys plus inserts
    val sorted = rows.sortBy(_.getTimestamp(0).getTime)
    assert(sorted.head.getLong(1) == 0L)
    assert(sorted.last.getLong(1) >= nCust)
  }

  test("q212: buckets partition the orders and stay balanced up to bin granularity") {
    val rows = graft.SparkEntry.queries("q212_range_splits")(spark, dir)
      .collect()
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.map(_.getLong(3)).sum == nOrders)
    // ranges are disjoint and ordered
    rows.sortBy(_.getLong(0)).sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1),
        "bucket ranges must not overlap")
    }
  }

  test("q227: l-diversity matches an independent distinct count per cell") {
    val rows = graft.queries.GovernanceQueries
      .queries("q227_l_diversity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val naive = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("CAST(c_nationkey AS BIGINT) AS nation",
        "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
          " div 100000 AS bal_band",
        "c_mktsegment AS seg")
      .groupBy("nation", "bal_band")
      .agg(count(lit(1)).as("n"), countDistinct("seg").as("l"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.length == naive.size)
    rows.foreach { r =>
      val (n, l) = naive((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == l)
      assert(r.getBoolean(4) == (n >= 4) && r.getBoolean(5) == (l >= 3))
      assert(r.getLong(6) <= 1000000L &&
        r.getLong(6) >= 1000000L / math.max(l, 1L) - 1)
    }
  }

  test("q228: variational distance matches an independent recount and is bounded") {
    val rows = graft.queries.GovernanceQueries
      .queries("q228_t_closeness")(spark, dir).collect()
    assert(rows.nonEmpty)
    val base = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("CAST(c_nationkey AS BIGINT) AS nation",
        "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
          " div 100000 AS bal_band",
        "c_mktsegment AS seg")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    val bigN = base.length.toLong
    val global = base.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byCell = base.groupBy(_._1)
    rows.foreach { r =>
      val cell = byCell((r.getLong(0), r.getLong(1)))
      val n = cell.length.toLong
      val counts = cell.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val dist = global.map { case (seg, g) =>
        math.abs(counts.getOrElse(seg, 0L) * bigN - g * n)
      }.sum
      assert(r.getLong(2) == n && r.getLong(3) == dist,
        s"cell (${r.getLong(0)}, ${r.getLong(1)})")
      assert(r.getLong(4) == 1000000L * dist / (2 * n * bigN))
      assert(r.getLong(4) <= 1000000L, "variational distance is <= 1")
    }
  }

  test("q221: KS stays inside the cross-multiplied bound; one row per source") {
    val rows = graft.queries.GovernanceQueries
      .queries("q221_ks_distance")(spark, dir).collect()
    val nSrc = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length == nSrc)
    rows.foreach { r =>
      val (nS, nO, ks, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(ks <= nS * nO, s"${r.getString(0)}: sup exceeds the bound")
      assert(ppm == 1000000L * ks / (nS * nO))
      assert(ppm <= 1000000L)
    }
  }

}
