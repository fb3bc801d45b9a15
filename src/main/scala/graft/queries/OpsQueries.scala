package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK
import graft.sources.Tables

/** Operational-analytics queries (q184+): market-basket association
  * rules, integer z-score burst detection over a dense time grid,
  * time-decayed reputation scoring, order-to-ship latency percentiles
  * from value-space histograms, and windowed last-touch attribution —
  * the monitoring/insight layer that runs NEXT TO a corpus pipeline
  * (which sources spike, which pairings predict each other, how stale
  * is a contributor's standing, where the fulfilment tail sits, what
  * converted).
  *
  * House rules: exact integers only (cents, ppm, epoch-millis, integer
  * cross-multiplied variance tests); every division is `div` on
  * non-negative operands or has its sign handled explicitly; no
  * rand(); every ORDER BY is a total order.
  */
object OpsQueries {

  /** q184: minimum basket co-occurrence count for a pair to form rules,
    * and rules kept per antecedent (by lift). */
  private val MinSup = 5L
  private val RulesPerAnt = 10

  /** q185: flag buckets with z > 2.5 — rendered as the integer test
    * 4·(x·n − S)² > 25·(n·Q − S²) on the positive side. */
  private val BurstNum = 25L
  private val BurstDen = 4L

  /** q186: decay halves a contribution per day of age, shift capped at
    * 40 (2⁻⁴⁰ of a cent rounds to zero long before the cap). */
  private val DecayCapDays = 40L

  /** q188: attribution window — a purchase converts the user's latest
    * click at most 7 days old. */
  private val AttribWindowMs = 604800000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ASSOCIATION RULES (q184): the market-basket classic (Agrawal &
    // Srikant 1994) over order baskets — for supplier pairs
    // co-occurring in ≥ MinSup orders, both directional rules A⇒C
    // with confidence (n_ab/n_a) and lift (n_ab·N/(n_a·n_c)) in ppm,
    // keeping each antecedent's top RulesPerAnt rules by lift. Scale
    // shape: the pair table comes from a per-order sorted-set explode
    // (one map-combinable shuffle on the order key — NEVER a fact
    // self-join, the same discipline as the kNN graph build); item
    // supports are a second map-combinable rollup; the basket count
    // is a broadcast scalar; and the per-antecedent cap runs through
    // TopKPerKeyExec, so the output is ≤ RulesPerAnt·|suppliers| at
    // any corpus size.
    "q184_association_rules" -> ((s, dir) => {
      val os = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val pair = os.groupBy("ok")
        .agg(sort_array(collect_set(col("sk"))).as("sks"))
        .select(explode(expr(
          """flatten(transform(sks, (a, i) ->
            |  transform(slice(sks, i + 2, size(sks)),
            |    b -> named_struct('sa', a, 'sb', b))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
        .agg(count(lit(1)).as("n_pair"))
        .where(col("n_pair") >= MinSup)
      val item = os.groupBy(col("sk")).agg(count(lit(1)).as("n_item"))
      val nb = os.agg(countDistinct("ok").as("n_baskets"))
      val rules = pair.select(col("sa").as("antecedent"),
          col("sb").as("consequent"), col("n_pair"))
        .unionAll(pair.select(col("sb").as("antecedent"),
          col("sa").as("consequent"), col("n_pair")))
      val scored = rules
        .join(item.select(col("sk").as("antecedent"),
          col("n_item").as("n_a")), "antecedent")
        .join(item.select(col("sk").as("consequent"),
          col("n_item").as("n_c")), "consequent")
        .crossJoin(broadcast(nb))
        .select(col("antecedent"), col("consequent"), col("n_a"),
          col("n_c"), col("n_pair"),
          expr("(CAST(1000000 AS BIGINT) * n_pair) div n_a")
            .as("confidence_ppm"),
          expr("(CAST(1000000 AS BIGINT) * n_pair * n_baskets)" +
            " div (n_a * n_c)").as("lift_ppm"))
      TopK.perKey(scored, Seq("antecedent"),
          Seq("lift_ppm" -> false, "consequent" -> true), k = RulesPerAnt)
        .select(col("antecedent"), col("consequent"), col("n_a"),
          col("n_c"), col("n_pair"), col("confidence_ppm"),
          col("lift_ppm"), col("rank"))
        .orderBy("antecedent", "rank")
    }),

    // BURST DETECTION (q185): per event type, the hourly buckets whose
    // count sits more than 2.5 standard deviations ABOVE the type's
    // mean — the traffic-spike / incident-detection primitive. The
    // grid is DENSE (every hour between the corpus min and max,
    // zero-filled), so quiet hours pull the mean down exactly as they
    // should; mean and variance never materialize as fractions — the
    // z-test cross-multiplies to 4·(x·n − S)² > 25·(n·Q − S²) over
    // int64 (bounded: hours per decade ≈ 87k, counts per bucket
    // bounded by the data). Scale shape: one map-combinable
    // (type, hour) rollup, a |types|·|hours| zero-filled grid off two
    // broadcast scalars, per-type window stats over that grid —
    // nothing corpus-sized past the first rollup, no global sort.
    "q185_burst_detection" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h"))
      val b = e.agg(min("h").as("h0"), max("h").as("h1"))
      val obs = e.groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      val grid = e.select("event_type").distinct()
        .crossJoin(broadcast(b))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"))).as("h"))
        .join(obs, Seq("event_type", "h"), "left")
        .na.fill(0L, Seq("x"))
      val byType = Window.partitionBy("event_type")
      grid
        .withColumn("n", count(lit(1)).over(byType))
        .withColumn("s", sum("x").over(byType))
        .withColumn("q", sum(col("x") * col("x")).over(byType))
        .where(col("x") * col("n") > col("s") &&
          lit(BurstDen) * (col("x") * col("n") - col("s")) *
            (col("x") * col("n") - col("s")) >
            lit(BurstNum) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_type"), col("h").as("hour_bucket"),
          col("x").as("cnt"), col("n"), col("s"))
        .orderBy("event_type", "hour_bucket")
    }),

    // TIME-DECAYED REPUTATION (q186): per-user standing where each
    // event contributes its value halved per day of age (relative to
    // the corpus's latest timestamp) — the freshness-weighted
    // reputation/priority score crawl scheduling and contributor
    // ranking use. Exponential decay stays exact-integer by using
    // base 2: cents div 2^age_days, shift capped at DecayCapDays.
    // Scale shape: one scalar max broadcast, one linear projection,
    // one map-combinable per-user rollup.
    "q186_decayed_reputation" -> ((s, dir) => {
      val mx = Tables.load(s, dir, "events")
        .agg(max(expr("unix_millis(ts)")).as("tmax"))
      Tables.load(s, dir, "events")
        .crossJoin(broadcast(mx))
        .select(col("user_id"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
          least(expr("(tmax - unix_millis(ts)) div 86400000"),
            lit(DecayCapDays)).as("age"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("cents").as("total_cents"),
          sum(expr("cents div shiftleft(CAST(1 AS BIGINT), CAST(age AS INT))"))
            .as("decayed_cents"))
        .orderBy("user_id")
    }),

    // LATENCY PERCENTILES (q187): order-to-ship latency p50/p90/p99
    // per order month — the fulfilment-SLA report, computed the only
    // way that scales: the latency value space is bounded (days), so
    // the percentiles come from a value-space histogram's cumulative
    // window (pXX = smallest latency whose running count reaches
    // XX % of the month), NEVER a global sort of the fact table.
    // Same single-lineage discipline as q182: the histogram is built
    // once and every statistic derives from it via same-partitioning
    // windows.
    "q187_latency_percentiles" -> ((s, dir) => {
      def pct(p: Int) = min(when(
        col("cc") * 100 >= col("ntot") * p, col("lat")))
      val lat = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("mon"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lat"))
      val h = lat.groupBy("mon", "lat").agg(count(lit(1)).as("c"))
      val byMon = Window.partitionBy("mon")
      h.withColumn("ntot", sum("c").over(byMon))
        .withColumn("cc", sum("c").over(
          Window.partitionBy("mon").orderBy("lat")))
        .groupBy("mon")
        .agg(max("ntot").as("n"), pct(50).as("p50"), pct(90).as("p90"),
          pct(99).as("p99"))
        .orderBy("mon")
    }),

    // LAST-TOUCH ATTRIBUTION (q188): every purchase attributed to the
    // user's LATEST prior click if it happened within the 7-day
    // window, else unattributed (-1) — the conversion-credit join
    // marketing analytics runs hourly. Rides the engine's AsOfJoin
    // operator (one hash shuffle + one sort — never an inequality
    // join), with the window bound applied AFTER the as-of match:
    // last-touch semantics credit only the latest click, so a latest
    // click older than the window means NO credit, not credit to an
    // earlier one. Output is one row per purchase — linear.
    "q188_attribution" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("value_cents"))
      graft.operators.AsOfJoin
        .leftAsOf(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
        .withColumn("gap",
          expr("unix_millis(ts) - unix_millis(matched_ts)"))
        .select(col("event_id"), col("user_id"), col("value_cents"),
          when(col("gap").isNotNull && col("gap") <= AttribWindowMs,
            col("click_id")).otherwise(-1L).as("click_id"),
          when(col("gap").isNotNull && col("gap") <= AttribWindowMs,
            col("gap")).otherwise(-1L).as("gap_ms"))
        .orderBy("event_id")
    }))

  val oracleSql: Map[String, String] = Map(

    // q184: the same pair/item/basket arithmetic; the per-antecedent
    // cap as a row_number window with the same tie order.
    "q184_association_rules" ->
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem),
         |nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM os),
         |item AS (SELECT sk, CAST(count(*) AS BIGINT) AS n_item
         |  FROM os GROUP BY 1),
         |pair AS (SELECT a.sk AS sa, b.sk AS sb,
         |    CAST(count(*) AS BIGINT) AS n_pair
         |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2
         |  HAVING count(*) >= $MinSup),
         |rules AS (
         |  SELECT sa AS antecedent, sb AS consequent, n_pair FROM pair
         |  UNION ALL SELECT sb, sa, n_pair FROM pair),
         |scored AS (SELECT r.antecedent, r.consequent,
         |  ia.n_item AS n_a, ic.n_item AS n_c, r.n_pair,
         |  (CAST(1000000 AS BIGINT) * r.n_pair) // ia.n_item
         |    AS confidence_ppm,
         |  (CAST(1000000 AS BIGINT) * r.n_pair * nb.n)
         |    // (ia.n_item * ic.n_item) AS lift_ppm
         |  FROM rules r
         |  JOIN item ia ON ia.sk = r.antecedent
         |  JOIN item ic ON ic.sk = r.consequent
         |  CROSS JOIN nb),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY antecedent
         |    ORDER BY lift_ppm DESC, consequent) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT antecedent, consequent, n_a, n_c, n_pair, confidence_ppm,
         |  lift_ppm, rank
         |FROM ranked WHERE rank <= $RulesPerAnt
         |ORDER BY antecedent, rank""".stripMargin,

    // q185: the same dense grid and the same cross-multiplied z-test.
    "q185_burst_detection" ->
      s"""WITH b AS (SELECT min(epoch_ms(ts)) // 3600000 AS h0,
         |  max(epoch_ms(ts)) // 3600000 AS h1 FROM events),
         |obs AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
         |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         |grid AS (SELECT t.event_type, g.h, coalesce(obs.x, 0) AS x
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(range(b.h0, b.h1 + 1)) AS h FROM b) g
         |  LEFT JOIN obs ON obs.event_type = t.event_type AND obs.h = g.h),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
         |  FROM grid GROUP BY 1)
         |SELECT g.event_type, g.h AS hour_bucket, g.x AS cnt, st.n, st.s
         |FROM grid g JOIN st USING (event_type)
         |WHERE g.x * st.n > st.s
         |  AND $BurstDen * (g.x * st.n - st.s) * (g.x * st.n - st.s) >
         |    $BurstNum * (st.n * st.q - st.s * st.s)
         |ORDER BY g.event_type, g.h""".stripMargin,

    // q186: same cents rounding, same capped base-2 decay.
    "q186_decayed_reputation" ->
      s"""WITH mx AS (SELECT max(epoch_ms(ts)) AS tmax FROM events),
         |e AS (SELECT user_id, CAST(round(value * 100, 0) AS BIGINT)
         |    AS cents,
         |  least((mx.tmax - epoch_ms(ts)) // 86400000, $DecayCapDays)
         |    AS age
         |  FROM events CROSS JOIN mx)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS total_cents,
         |  CAST(sum(cents // (CAST(1 AS BIGINT) << CAST(age AS INT)))
         |    AS BIGINT) AS decayed_cents
         |FROM e GROUP BY 1 ORDER BY user_id""".stripMargin,

    // q187: the same histogram-cumsum percentile definition.
    "q187_latency_percentiles" ->
      s"""WITH l AS (SELECT
         |  CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
         |    AS mon,
         |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
         |    CAST(li.l_shipdate AS DATE)) AS BIGINT) AS lat
         |  FROM orders o JOIN lineitem li ON li.l_orderkey = o.o_orderkey),
         |h AS (SELECT mon, lat, CAST(count(*) AS BIGINT) AS c
         |  FROM l GROUP BY 1, 2),
         |cum AS (SELECT mon, lat,
         |  sum(c) OVER (PARTITION BY mon ORDER BY lat) AS cc,
         |  sum(c) OVER (PARTITION BY mon) AS ntot FROM h)
         |SELECT mon, CAST(max(ntot) AS BIGINT) AS n,
         |  CAST(min(CASE WHEN 100 * cc >= 50 * ntot THEN lat END)
         |    AS BIGINT) AS p50,
         |  CAST(min(CASE WHEN 100 * cc >= 90 * ntot THEN lat END)
         |    AS BIGINT) AS p90,
         |  CAST(min(CASE WHEN 100 * cc >= 99 * ntot THEN lat END)
         |    AS BIGINT) AS p99
         |FROM cum GROUP BY mon ORDER BY mon""".stripMargin,

    // q188: DuckDB's native ASOF LEFT JOIN with the same post-window.
    "q188_attribution" ->
      s"""WITH clicks AS (SELECT user_id, ts, max(event_id) AS click_id
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, ts,
         |  CAST(round(value * 100, 0) AS BIGINT) AS value_cents
         |  FROM events WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id, p.value_cents,
         |  CASE WHEN c.ts IS NOT NULL
         |      AND epoch_ms(p.ts) - epoch_ms(c.ts) <= $AttribWindowMs
         |    THEN c.click_id ELSE -1 END AS click_id,
         |  CASE WHEN c.ts IS NOT NULL
         |      AND epoch_ms(p.ts) - epoch_ms(c.ts) <= $AttribWindowMs
         |    THEN epoch_ms(p.ts) - epoch_ms(c.ts) ELSE -1 END AS gap_ms
         |FROM p ASOF LEFT JOIN clicks c
         |  ON c.user_id = p.user_id AND c.ts <= p.ts
         |ORDER BY p.event_id""".stripMargin)
}
