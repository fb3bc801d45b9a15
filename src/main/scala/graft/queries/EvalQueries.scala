package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity, TopK}
import graft.sources.Tables

/** Evaluation-style analytics (q194+): does the embedding space
  * separate its labels (nearest-centroid confusion matrix), how does
  * accuracy trade against coverage under a confidence threshold
  * (risk–coverage curve), how label-homogeneous are the ANN hash
  * buckets (purity audit), which way is each event stream trending
  * (integer OLS), and does a transition model trained on the first
  * half of time predict the second (temporal Markov eval) — the
  * model-quality instrumentation a training-data pipeline runs on its
  * own artifacts.
  *
  * House rules: exact integers only (the q82/q98 quantization
  * discipline for embeddings, ppm fixed-point, cross-multiplied
  * comparisons); divisions are `div` on non-negative operands —
  * q196's signed slope is emitted as a (num, den, sign) rational, not
  * divided; no rand(); every ORDER BY is a total order.
  */
object EvalQueries {

  /** q195: margin_ppm acceptance thresholds swept (0 = accept all). */
  private val Thresholds: Seq[Long] =
    Seq(0L, 5000L, 10000L, 20000L, 40000L, 80000L, 160000L)

  /** Quantized embeddings with their labels, and the per-label integer
    * centroid table (c = Σq div n per dimension, ordered dim list) —
    * shared by q194/q195. Both stages are map-combinable rollups; the
    * centroid table is |labels| rows and broadcasts. */
  private def labeled(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        KMeans.quantize(col("embedding")).as("qv"))

  private def centroids(e: DataFrame): DataFrame =
    e.select(col("label").as("cl"), posexplode(col("qv")).as(Seq("d", "q")))
      .groupBy("cl", "d")
      .agg(expr("sum(q) div count(1)").as("c"))
      .groupBy("cl")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        x => x.getField("c")).as("cv"))

  /** Exact squared-L2 of every (vector, label centroid) pair through
    * the codegen'd kernel — |vectors|·|labels| rows, a broadcast
    * nested-loop over a |labels|-row table (the q98 classify shape). */
  private def distances(s: SparkSession, dir: String): DataFrame = {
    val e = labeled(s, dir)
    e.crossJoin(broadcast(centroids(e)))
      .select(col("vec_id"), col("label"), col("cl"),
        KMeans.sqDist(col("qv"), col("cv")).as("d2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NEAREST-CENTROID CONFUSION MATRIX (q194): classify every vector
    // to its nearest label centroid (integer means of the q82/q98
    // quantization) and report the label × prediction matrix with
    // row shares — the fastest meaningful "is this embedding space
    // worth training on" check, and the exact-integer stand-in for
    // the LDA/probe-classifier audits run on real corpora. Scale
    // shape: centroids are two map-combinable rollups to |labels|·dim
    // then |labels| rows; scoring is a broadcast nested-loop against
    // that tiny table with the codegen'd sqdist kernel; argmin runs
    // through TopKPerKeyExec; the matrix is |labels|² cells with the
    // row share attached by a same-partition window (single lineage,
    // no join-back).
    "q194_centroid_classifier" -> ((s, dir) => {
      val pred = TopK.perKey(distances(s, dir), Seq("vec_id"),
          Seq("d2" -> true, "cl" -> true), k = 1)
        .select(col("label"), col("cl").as("pred"))
      val conf = pred.groupBy("label", "pred").agg(count(lit(1)).as("n"))
      conf
        .withColumn("nl", sum("n").over(Window.partitionBy("label")))
        .select(col("label"), col("pred"), col("n"),
          expr("(CAST(1000000 AS BIGINT) * n) div nl").as("share_ppm"))
        .orderBy("label", "pred")
    }),

    // RISK–COVERAGE CURVE (q195): selective classification over the
    // q194 classifier — accept a prediction only when the relative
    // margin between the best and second-best centroid distances
    // clears a threshold, and report coverage and accuracy at each
    // sweep point (the risk–coverage trade every triage/routing
    // deployment tunes). margin_ppm = 10⁶·(d₂−d₁) div d₂ is
    // scale-invariant, so the same grid works at any quantization.
    // Scale shape: the per-vector best/second fold runs through
    // TopKPerKeyExec (k = 2) + a pivot aggregate; the sweep is a
    // literal |Thresholds|-way explode over the |vectors|-row margin
    // table into a map-combinable rollup.
    "q195_risk_coverage" -> ((s, dir) => {
      val top2 = TopK.perKey(distances(s, dir), Seq("vec_id"),
          Seq("d2" -> true, "cl" -> true), k = 2)
      val m = top2.groupBy("vec_id", "label")
        .agg(min(when(col("rank") === 1, col("cl"))).as("pred"),
          min(when(col("rank") === 1, col("d2"))).as("d_best"),
          min(when(col("rank") === 2, col("d2"))).as("d_second"))
        .select(col("label"), col("pred"),
          expr("(CAST(1000000 AS BIGINT) * (d_second - d_best))" +
            " div d_second").as("margin_ppm"))
      val tot = m.agg(count(lit(1)).as("total"))
      m.crossJoin(broadcast(tot))
        .select(col("label"), col("pred"), col("margin_ppm"), col("total"),
          explode(typedLit(Thresholds)).as("threshold_ppm"))
        .groupBy("threshold_ppm")
        .agg(max("total").as("total"),
          sum(when(col("margin_ppm") >= col("threshold_ppm"), 1L)
            .otherwise(0L)).as("n_accepted"),
          sum(when(col("margin_ppm") >= col("threshold_ppm") &&
            col("label") === col("pred"), 1L).otherwise(0L)).as("n_ok"))
        .select(col("threshold_ppm"), col("n_accepted"),
          expr("(CAST(1000000 AS BIGINT) * n_accepted) div total")
            .as("coverage_ppm"),
          when(col("n_accepted") === 0, -1L)
            .otherwise(expr("(CAST(1000000 AS BIGINT) * n_ok)" +
              " div n_accepted")).as("accuracy_ppm"))
        .orderBy("threshold_ppm")
    }),

    // ANN BUCKET PURITY (q196... numbered q197 below; see binding
    // order in the map — Scala Maps are unordered, the keys carry
    // the numbering).
    //
    // TREND SLOPE (q196): per event type, the integer least-squares
    // slope of daily counts over the dense day grid — emitted as the
    // exact rational (slope_num, slope_den) with its sign, never a
    // float division and never a `div` on a possibly-negative
    // numerator (Spark truncates toward zero, DuckDB floors — the
    // one integer-division semantics trap, sidestepped by not
    // dividing). slope = (n·Σkx − Σk·Σx) / (n·Σk² − (Σk)²). Scale
    // shape: one map-combinable rollup + broadcast scalars + a
    // |types|·|days| grid aggregate.
    "q196_trend_slope" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("d"))
      val b = e.agg(min("d").as("d0"), max("d").as("d1"))
      val obs = e.groupBy("event_type", "d").agg(count(lit(1)).as("x"))
      val grid = e.select("event_type").distinct()
        .crossJoin(broadcast(b))
        .select(col("event_type"), col("d0"),
          explode(sequence(col("d0"), col("d1"))).as("d"))
        .join(obs, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("x"))
        .withColumn("k", col("d") - col("d0") + 1)
      grid.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          (count(lit(1)) * sum(col("k") * col("x")) -
            sum("k") * sum("x")).as("slope_num"),
          (count(lit(1)) * sum(col("k") * col("k")) -
            sum("k") * sum("k")).as("slope_den"))
        .withColumn("direction",
          when(col("slope_num") > 0, 1L)
            .when(col("slope_num") < 0, -1L).otherwise(0L))
        .orderBy("event_type")
    }),

    // ANN BUCKET PURITY (q197): the label homogeneity of the q56 LSH
    // table's buckets — per bucket: population, majority label, and
    // purity (majority share, ppm). High purity everywhere means the
    // hash geometry respects the label structure (bucketed ANN will
    // mostly return same-label neighbors); a low-purity bucket is
    // where ANN recall pays. Scale shape: the bucket id is the q56
    // hyperplane projection (a pure per-row expression over plan-
    // literal planes), the histogram is one map-combinable rollup,
    // and population + majority attach via a same-partition window +
    // TopKPerKeyExec k = 1 on the |buckets|·|labels| histogram —
    // single lineage, nothing corpus-sized past the scan.
    "q197_bucket_purity" -> ((s, dir) => {
      val h = Tables.load(s, dir, "embeddings")
        .select(Similarity.bucket(col("embedding")).cast("long")
          .as("bucket"), col("label").cast("long").as("label"))
        .groupBy("bucket", "label").agg(count(lit(1)).as("c"))
        .withColumn("n", sum("c").over(Window.partitionBy("bucket")))
      TopK.perKey(h, Seq("bucket"), Seq("c" -> false, "label" -> true),
          k = 1)
        .select(col("bucket"), col("n"), col("label").as("top_label"),
          col("c").as("top_n"),
          expr("(CAST(1000000 AS BIGINT) * c) div n").as("purity_ppm"))
        .orderBy("bucket")
    }),

    // TEMPORAL MARKOV EVAL (q198): train the q120-style next-event
    // model (per current type, the most frequent next type) on
    // transitions that COMPLETE in the first half of the time range,
    // score it on transitions that START in the second half — the
    // walk-forward eval that catches drift a resubstitution accuracy
    // hides. Exact integers, deterministic argmax (count desc, type
    // asc). Scale shape: one lead() window per user partition builds
    // transitions, the model is a |types|²-bounded rollup through
    // TopKPerKeyExec k = 1 and broadcasts, the eval is one
    // map-combinable rollup.
    "q198_markov_eval" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      val tr = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_millis(ts)").as("t"),
          expr("unix_millis(ts) div 86400000").as("d"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("next_d", lead("d", 1).over(w))
        .where(col("next_type").isNotNull)
      val b = tr.agg(min("d").as("d0"), max(greatest(col("d"),
        col("next_d"))).as("d1"))
      val t2 = tr.crossJoin(broadcast(b))
        .withColumn("mid", expr("(d0 + d1) div 2"))
      val model = TopK.perKey(
        t2.where(col("next_d") <= col("mid"))
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("c")),
        Seq("event_type"), Seq("c" -> false, "next_type" -> true), k = 1)
        .select(col("event_type"), col("next_type").as("predicted"))
      t2.where(col("d") > col("mid"))
        .join(broadcast(model), Seq("event_type"))
        .groupBy("event_type", "predicted")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("next_type") === col("predicted"), 1L)
            .otherwise(0L)).as("n_correct"))
        .select(col("event_type"), col("predicted"), col("n_test"),
          col("n_correct"),
          expr("(CAST(1000000 AS BIGINT) * n_correct) div n_test")
            .as("accuracy_ppm"))
        .orderBy("event_type")
    }))

  /** The shared q194/q195 oracle prefix: quantized vectors, per-label
    * integer centroids as ordered lists, all pair distances. */
  private def distCtes: String =
    s"""e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |  ${KMeans.quantizeSql("embedding")} AS qv FROM embeddings),
       |dims AS (SELECT vec_id, label, generate_subscripts(qv, 1) AS d,
       |  unnest(qv) AS q FROM e),
       |cent AS (SELECT label AS cl, d,
       |  CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
       |  FROM dims GROUP BY 1, 2),
       |cvs AS (SELECT cl, list(c ORDER BY d) AS cv FROM cent GROUP BY 1),
       |dist AS (SELECT e.vec_id, e.label, cvs.cl,
       |  ${KMeans.sqDistSql("e.qv", "cvs.cv", Similarity.Dim)} AS d2
       |  FROM e CROSS JOIN cvs)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    // q194: same centroids, same argmin tie order, share by window.
    "q194_centroid_classifier" ->
      s"""WITH $distCtes,
         |pred AS (SELECT label, cl AS pred FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY d2, cl) AS rn FROM dist) WHERE rn = 1),
         |conf AS (SELECT label, pred, CAST(count(*) AS BIGINT) AS n
         |  FROM pred GROUP BY 1, 2)
         |SELECT label, pred, n,
         |  CAST((1000000 * n) // (sum(n) OVER (PARTITION BY label))
         |    AS BIGINT) AS share_ppm
         |FROM conf ORDER BY label, pred""".stripMargin,

    // q195: same margin rational and the same literal sweep grid.
    "q195_risk_coverage" ->
      s"""WITH $distCtes,
         |best AS (SELECT vec_id, label,
         |  min(CASE WHEN rn = 1 THEN cl END) AS pred,
         |  CAST(min(CASE WHEN rn = 1 THEN d2 END) AS BIGINT) AS d_best,
         |  CAST(min(CASE WHEN rn = 2 THEN d2 END) AS BIGINT) AS d_second
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY d2, cl) AS rn FROM dist)
         |  GROUP BY 1, 2),
         |m AS (SELECT label, pred,
         |  CAST((1000000 * (d_second - d_best)) // d_second AS BIGINT)
         |    AS margin_ppm FROM best),
         |thr AS (SELECT unnest([${Thresholds.mkString(", ")}]) AS t),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS total FROM m)
         |SELECT CAST(thr.t AS BIGINT) AS threshold_ppm,
         |  CAST(count(*) FILTER (m.margin_ppm >= thr.t) AS BIGINT)
         |    AS n_accepted,
         |  CAST((1000000 * count(*) FILTER (m.margin_ppm >= thr.t))
         |    // nn.total AS BIGINT) AS coverage_ppm,
         |  CAST(coalesce((1000000 * count(*) FILTER (m.margin_ppm >= thr.t
         |      AND m.pred = m.label))
         |    // nullif(count(*) FILTER (m.margin_ppm >= thr.t), 0), -1)
         |    AS BIGINT) AS accuracy_ppm
         |FROM m CROSS JOIN thr CROSS JOIN nn
         |GROUP BY thr.t, nn.total ORDER BY threshold_ppm""".stripMargin,

    // q196: same dense grid, slope as an undivided rational + sign.
    "q196_trend_slope" ->
      s"""WITH b AS (SELECT min(epoch_ms(ts)) // 86400000 AS d0,
         |  max(epoch_ms(ts)) // 86400000 AS d1 FROM events),
         |obs AS (SELECT event_type, epoch_ms(ts) // 86400000 AS d,
         |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         |grid AS (SELECT t.event_type, g.d - b2.d0 + 1 AS k,
         |  coalesce(obs.x, 0) AS x
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(range(b.d0, b.d1 + 1)) AS d FROM b) g
         |  CROSS JOIN b b2
         |  LEFT JOIN obs ON obs.event_type = t.event_type AND obs.d = g.d)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(count(*) * sum(k * x) - sum(k) * sum(x) AS BIGINT)
         |    AS slope_num,
         |  CAST(count(*) * sum(k * k) - sum(k) * sum(k) AS BIGINT)
         |    AS slope_den,
         |  CAST(CASE WHEN count(*) * sum(k * x) - sum(k) * sum(x) > 0 THEN 1
         |    WHEN count(*) * sum(k * x) - sum(k) * sum(x) < 0 THEN -1
         |    ELSE 0 END AS BIGINT) AS direction
         |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin,

    // q197: the q56 bucket expression, the same k=1 tie order.
    "q197_bucket_purity" ->
      s"""WITH e AS (SELECT CAST(${Similarity.bucketSql("embedding")}
         |    AS BIGINT) AS bucket,
         |  CAST(label AS BIGINT) AS label FROM embeddings),
         |h AS (SELECT bucket, label, CAST(count(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |hn AS (SELECT *, CAST(sum(c) OVER (PARTITION BY bucket)
         |  AS BIGINT) AS n FROM h),
         |tops AS (SELECT bucket, n, label AS top_label, c AS top_n FROM (
         |  SELECT *, row_number() OVER (PARTITION BY bucket
         |    ORDER BY c DESC, label) AS rn FROM hn) WHERE rn = 1)
         |SELECT bucket, n, top_label, top_n,
         |  CAST((1000000 * top_n) // n AS BIGINT) AS purity_ppm
         |FROM tops ORDER BY bucket""".stripMargin,

    // q198: same lead() transitions, same split, same argmax ties.
    "q198_markov_eval" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ms(ts) AS t, epoch_ms(ts) // 86400000 AS d FROM events),
         |seq AS (SELECT *,
         |  lead(event_type) OVER w AS next_type,
         |  lead(d) OVER w AS next_d
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         |tr AS (SELECT event_type, next_type, d, next_d FROM seq
         |  WHERE next_type IS NOT NULL),
         |b AS (SELECT min(d) AS d0, max(greatest(d, next_d)) AS d1 FROM tr),
         |split AS (SELECT (b.d0 + b.d1) // 2 AS mid FROM b),
         |train AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT)
         |    AS c
         |  FROM tr CROSS JOIN split WHERE tr.next_d <= split.mid
         |  GROUP BY 1, 2),
         |model AS (SELECT event_type, next_type AS predicted FROM (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY c DESC, next_type) AS rn FROM train) WHERE rn = 1),
         |test AS (SELECT tr.event_type, tr.next_type
         |  FROM tr CROSS JOIN split WHERE tr.d > split.mid)
         |SELECT t.event_type, m.predicted,
         |  CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(count(*) FILTER (t.next_type = m.predicted) AS BIGINT)
         |    AS n_correct,
         |  CAST((1000000 * count(*) FILTER (t.next_type = m.predicted))
         |    // count(*) AS BIGINT) AS accuracy_ppm
         |FROM test t JOIN model m ON m.event_type = t.event_type
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
}
