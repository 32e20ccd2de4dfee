package graft.analytics

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: Array[Float]`, 64-dim).
  *
  * Three tiers, mirroring how an ANN pipeline scales:
  *   - `sim_cosine_topk`: brute-force exact top-k — the correctness
  *     baseline. O(Q*N); fine when Q is small (the query side broadcasts).
  *   - `sim_lsh_ann`: random-hyperplane LSH — vectors hash to one of
  *     2^[[Planes]] sign-pattern buckets; search is an equi-join on the
  *     bucket key, so at 100 TB Spark shuffles on the key and each task
  *     reranks one bucket (plane count scaled to hold occupancy constant).
  *   - `sim_ivf_topk`: IVF — coarse centroids (per-label means), each vector
  *     assigned to its nearest cell; queries probe the 2 nearest cells. The
  *     centroid table is tiny (broadcast); the cell assignment is one narrow
  *     pass over the vectors.
  *
  * Determinism: vectors are quantized to round(x*1e6) BIGINTs, so dot
  * products / norms / L2 distances are exact integers; the single
  * floating-point division per pair is identical IEEE in Spark and DuckDB;
  * ranking orders by the unrounded double with vec_id tie-breaks.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** Number of hyperplanes (2^Planes buckets) — THE scale lever of every
    * LSH consumer (sim_lsh_ann / sim_lsh_recall / sim_knn_classify /
    * dedup_embedding_lsh): candidate generation is an equi-join on the
    * bucket key, so pair mass is quadratic in bucket occupancy and a fixed
    * key space turns quadratic at scale. Any fixed value is deterministic
    * (the oracle SQL is generated from the same constant), so the default
    * stays 6 for the sf-scale gates and a deployment raises it with the
    * corpus — `SPARK_GRAFT_LSH_PLANES` overrides per run, [[planesFor]]
    * gives the corpus-scaled choice.
    */
  val DefaultPlanes = 6
  val Planes: Int = sys.env.get("SPARK_GRAFT_LSH_PLANES") match {
    case None => DefaultPlanes
    case Some(raw) =>
      // fail loudly, naming the knob: a bad value would otherwise surface
      // as an ExceptionInInitializerError (parse) or an analysis error from
      // hyperplane_key (range) that never mentions the env var. Upper
      // bound 24 keeps 2*Planes (the multi-table key) within the
      // expression's 62-bit limit with room to spare.
      val p = scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_LSH_PLANES must be an integer in 1..24, got: '$raw'"))
      if (p < 1 || p > 24) throw new IllegalArgumentException(
        s"SPARK_GRAFT_LSH_PLANES must be in 1..24, got: $p")
      p
  }

  /** Corpus-scaled plane count: the smallest key space that keeps expected
    * bucket occupancy at or under `targetOccupancy` for a uniform corpus —
    * ceil(log2(n / target)) — clamped to [DefaultPlanes, 24]. Occupancy is
    * what bounds per-bucket rerank cost AND candidate-pair mass, so holding
    * it constant keeps LSH linear in corpus size: 2^k more vectors, k more
    * planes, same per-bucket work.
    */
  def planesFor(corpusRows: Long, targetOccupancy: Long = 1024L): Int = {
    val needed = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(corpusRows / math.max(targetOccupancy, 1L), 1L) - 1L)
    math.min(math.max(needed, DefaultPlanes), 24)
  }

  /** DuckDB fold for the deterministic integer hyperplane key, weights
    * w(i,j) = ((i*37+j*101)%19)-9 — the oracle twin of `hyperplane_key`.
    */
  private[analytics] def lshKeyD(qe: String): String = lshKeyD(qe, Planes)

  private[analytics] def lshKeyD(qe: String, planes: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), generate_series(0, ${planes - 1})), (acc, i) -> acc + " +
      s"CASE WHEN CAST(list_sum(list_transform(generate_series(1, len($qe)), " +
      s"j -> (((i * 37 + j * 101) % 19) - 9) * $qe[j])) AS BIGINT) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)"

  /** Oracle CTE: quantized vectors with exact integer norms, plus the
    * embedding dimensionality derived from the data (`dim`) so per-lane
    * oracle arithmetic never hardcodes a lane count the Spark side derives.
    */
  private val OracleQ =
    s"""WITH q AS (SELECT vec_id, label, ${quantizeD("embedding")} AS qe FROM embeddings),
       |n AS (SELECT vec_id, label, qe, ${dotD("qe", "qe")} AS nrm FROM q),
       |dim AS (SELECT max(len(qe)) AS d FROM q)""".stripMargin

  /** A 1..dim series for per-lane list_transforms in the oracle SQL. */
  private val LaneSeries = "generate_series(1, (SELECT d FROM dim))"

  val all: Map[String, QuerySpec] = Map(

    // ----- brute-force exact cosine top-k (baseline) ------------------------
    "sim_cosine_topk" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
        val queries = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qe").as("qa"), col("nrm").as("na"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("c").desc, col("vec_id"))
        broadcast(queries)
          .join(n, col("vec_id") =!= col("q_id"))
          .withColumn("c", expr("long_dot(qa, qe) / (sqrt(na) * sqrt(nrm))"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("q_id"), col("vec_id"), expr("round(c, 6)").as("cosine"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""$OracleQ,
             |p AS (SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             |    ${dotD("a.qe", "b.qe")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS c
             |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
             |r AS (SELECT q_id, vec_id, c,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn FROM p)
             |SELECT q_id, vec_id, round(c, 6) AS cosine, rn FROM r
             |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin)
    ),

    // ----- hyperplane-LSH bucketed ANN: bucket equi-join + exact rerank -----
    "sim_lsh_ann" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
          .withColumn("bucket", expr(s"hyperplane_key(qe, $Planes)"))
        val queries = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qe").as("qa"),
            col("nrm").as("na"), col("bucket").as("qb"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("c").desc, col("vec_id"))
        broadcast(queries)
          .join(n, col("qb") === col("bucket") && col("vec_id") =!= col("q_id"))
          .withColumn("c", expr("long_dot(qa, qe) / (sqrt(na) * sqrt(nrm))"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"), col("bucket"),
            expr("round(c, 6)").as("cosine"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""$OracleQ,
             |bk AS (SELECT vec_id, qe, nrm, ${lshKeyD("qe")} AS bucket FROM n),
             |p AS (SELECT a.vec_id AS q_id, b.vec_id AS vec_id, b.bucket,
             |    ${dotD("a.qe", "b.qe")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS c
             |  FROM bk a JOIN bk b
             |    ON a.vec_id < 5 AND a.bucket = b.bucket AND b.vec_id <> a.vec_id),
             |r AS (SELECT q_id, vec_id, bucket, c,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn FROM p)
             |SELECT q_id, vec_id, bucket, round(c, 6) AS cosine, rn FROM r
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)
    ),

    // ----- multi-probe LSH ANN: probe the bucket + its hamming-1 ring ------
    // The standard recall lever that does NOT grow the corpus-side work
    // (multi-probe LSH): a near neighbor that one hyperplane pushed into an
    // adjacent bucket is recovered by ALSO probing every key at hamming
    // distance 1 from the query's own — Planes+1 probe keys per query,
    // exploded on the (broadcast) query side only. The corpus is hashed
    // and shuffled exactly once, the join stays an equi-join on the bucket
    // key, and since a corpus vector sits in one fixed bucket it can match
    // at most one probe key — no pair dedup needed. Candidate mass is
    // (Planes+1)x one bucket's occupancy: linear, not another table.
    "sim_lsh_multiprobe" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
          .withColumn("bucket", expr(s"hyperplane_key(qe, $Planes)"))
        val queries = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qe").as("qa"),
            col("nrm").as("na"), col("bucket").as("qb"))
          .withColumn("probe", explode(expr(
            s"concat(array(qb), transform(sequence(0, ${Planes - 1}), " +
              "i -> qb ^ shiftleft(cast(1 as bigint), i)))")))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("c").desc, col("vec_id"))
        broadcast(queries)
          .join(n, col("probe") === col("bucket") && col("vec_id") =!= col("q_id"))
          .withColumn("c", expr("long_dot(qa, qe) / (sqrt(na) * sqrt(nrm))"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"), col("bucket"),
            expr("round(c, 6)").as("cosine"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""$OracleQ,
             |bk AS (SELECT vec_id, qe, nrm, ${lshKeyD("qe")} AS bucket FROM n),
             |p AS (SELECT a.vec_id AS q_id, b.vec_id AS vec_id, b.bucket,
             |    ${dotD("a.qe", "b.qe")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS c
             |  FROM bk a JOIN bk b
             |    ON a.vec_id < 5 AND b.vec_id <> a.vec_id
             |    AND bit_count(xor(a.bucket, b.bucket)) <= 1),
             |r AS (SELECT q_id, vec_id, bucket, c,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn FROM p)
             |SELECT q_id, vec_id, bucket, round(c, 6) AS cosine, rn FROM r
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)
    ),

    // ----- ANN quality measurement: recall@5 of LSH vs exact ground truth ---
    // The evaluation loop every ANN deployment runs: for each query, compare
    // the LSH top-k against the brute-force top-k and report the overlap
    // fraction. Ground truth is exact over the full corpus (fine for a small
    // probe set of queries — the query side broadcasts); at 100 TB the same
    // query runs over a sampled partition of the corpus. The shared
    // quantized projection is persisted: both branches reference it and its
    // lineage is the full corpus scan.
    "sim_lsh_recall" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
          .withColumn("bucket", expr(s"hyperplane_key(qe, $Planes)"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val queries = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qe").as("qa"),
            col("nrm").as("na"), col("bucket").as("qb"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("c").desc, col("vec_id"))
        def top5(joined: org.apache.spark.sql.DataFrame) = joined
          .withColumn("c", expr("long_dot(qa, qe) / (sqrt(na) * sqrt(nrm))"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"))
        val exact = top5(broadcast(queries).join(n, col("vec_id") =!= col("q_id")))
        val lsh = top5(broadcast(queries)
          .join(n, col("qb") === col("bucket") && col("vec_id") =!= col("q_id")))
        exact.join(lsh.withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(col("hit")).as("n_hits"))
          .withColumn("recall", expr("floor(n_hits / 5 * 1e6 + 0.5) / 1e6"))
          .orderBy(col("q_id"))
      },
      Some(s"""$OracleQ,
             |bk AS (SELECT vec_id, qe, nrm, ${lshKeyD("qe")} AS bucket FROM n),
             |ex AS (SELECT q_id, vec_id FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |      ORDER BY ${dotD("a.qe", "b.qe")} / (sqrt(a.nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rn
             |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id) z WHERE rn <= 5),
             |ls AS (SELECT q_id, vec_id FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |      ORDER BY ${dotD("a.qe", "b.qe")} / (sqrt(a.nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rn
             |  FROM bk a JOIN bk b ON a.vec_id < 5 AND a.bucket = b.bucket AND b.vec_id <> a.vec_id) z
             |  WHERE rn <= 5)
             |SELECT ex.q_id, COUNT(ls.vec_id) AS n_hits,
             |  floor(COUNT(ls.vec_id) / 5 * 1e6 + 0.5) / 1e6 AS recall
             |FROM ex LEFT JOIN ls ON ex.q_id = ls.q_id AND ex.vec_id = ls.vec_id
             |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)
    ),

    // ----- kNN majority-vote classification via LSH buckets -----------------
    // Label propagation: every vector is classified by the majority label of
    // its 7 nearest same-bucket neighbors; output is the (true, predicted)
    // confusion matrix. The candidate set is the LSH bucket equi-join (never
    // all-pairs), votes are one map-side-combined count, and the argmax is a
    // per-vector window over at most #labels rows — each stage scales
    // linearly in matched pairs. Ties break deterministically: cosine ties
    // by vec_id, vote ties by smallest label.
    "sim_knn_classify" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        graft.functions.SketchAggregators.register(s)
        val bk = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), col("label"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
          .withColumn("bucket", expr(s"hyperplane_key(qe, $Planes)"))
        // top-7 neighbors via the bounded mergeable aggregate, NOT a
        // row_number window: the candidate set is quadratic in bucket
        // occupancy, and a window would shuffle-sort all of it — the
        // aggregator's partial phase cuts each map task to 7 rows per
        // vector before the exchange (same ORDER BY c DESC, nb_id ties)
        val votes = bk.as("x")
          .join(bk.as("y"),
            col("x.bucket") === col("y.bucket") && col("y.vec_id") =!= col("x.vec_id"))
          .select(col("x.vec_id").as("v"), col("x.label").as("true_label"),
            col("y.vec_id").as("nb_id"), col("y.label").as("nl"),
            expr("long_dot(x.qe, y.qe) / (sqrt(x.nrm) * sqrt(y.nrm))").as("c"))
          .groupBy(col("v"), col("true_label"))
          .agg(expr("top7_by_score(c, nb_id, nl)").as("nbrs"))
          .select(col("v"), col("true_label"), explode(col("nbrs")).as("nb"))
          .groupBy(col("v"), col("true_label"), col("nb._3").as("nl"))
          .agg(count(lit(1)).as("nv"))
        val wp = Window.partitionBy(col("v")).orderBy(col("nv").desc, col("nl"))
        votes
          .withColumn("pn", row_number().over(wp))
          .filter(col("pn") === 1)
          .groupBy(col("true_label").as("label"), col("nl").as("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("predicted"))
      },
      Some(s"""$OracleQ,
             |bk AS (SELECT vec_id, label, qe, nrm, ${lshKeyD("qe")} AS bucket FROM n),
             |pr AS (SELECT x.vec_id AS v, x.label AS true_label, y.label AS nl,
             |    ROW_NUMBER() OVER (PARTITION BY x.vec_id
             |      ORDER BY ${dotD("x.qe", "y.qe")} / (sqrt(x.nrm) * sqrt(y.nrm)) DESC, y.vec_id) AS rn
             |  FROM bk x JOIN bk y ON x.bucket = y.bucket AND y.vec_id <> x.vec_id),
             |votes AS (SELECT v, true_label, nl, COUNT(*) AS nv FROM pr WHERE rn <= 7
             |  GROUP BY 1, 2, 3),
             |pred AS (SELECT v, true_label, nl AS predicted FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY v ORDER BY nv DESC, nl) AS pn
             |  FROM votes) z WHERE pn = 1)
             |SELECT true_label AS label, predicted, COUNT(*) AS n FROM pred
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // ----- IVF: per-label centroids, nearest-cell assignment, 2-cell probe --
    "sim_ivf_topk" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        // persist: three consumers (centroid build, cell assignment, query
        // probes) each re-run the parquet scan + 64-lane quantization
        // otherwise — the dominant cost of the whole query
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), col("label"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // centroid per label: per-dimension mean via posexplode + groupBy —
        // partial aggregation does the heavy lifting map-side and no row ever
        // holds more than one (label, dim) sum, so a hot label can't OOM an
        // executor the way a collect_list of every vector would. Same
        // round(sum/cnt) arithmetic as the oracle, so hashes are unchanged.
        // persist: the plan references cent twice (probe + assignment
        // cross-joins) and its lineage is a full pass over the vectors —
        // the cached table itself is only #labels rows
        val cent = n
          .select(col("label"), posexplode(col("qe")).as(Seq("j", "v")))
          .groupBy(col("label").as("c_id"), col("j"))
          .agg(expr("cast(round(sum(v) / count(1)) as bigint)").as("cj"))
          .groupBy(col("c_id"))
          .agg(transform(array_sort(collect_list(struct(col("j"), col("cj")))),
            x => x.getField("cj")).as("ce"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // assign every vector to its nearest centroid (exact integer L2^2).
        // argmin as min(struct(dist, c_id)) under groupBy rather than a
        // per-vector window: partial aggregation combines map-side, so the
        // vectors x centroids table is reduced before its shuffle instead
        // of being shuffle-sorted whole; ties break on c_id exactly like
        // the oracle's ORDER BY dist, c_id. qe/nrm are constant per vec_id,
        // so first() is deterministic.
        val l2 = "long_l2(%s, %s)"
        val assigned = n.crossJoin(broadcast(cent))
          .withColumn("dist", expr(l2.format("qe", "ce")))
          .groupBy(col("vec_id"))
          .agg(first(col("qe")).as("qe"), first(col("nrm")).as("nrm"),
            min(struct(col("dist"), col("c_id"))).as("m"))
          .select(col("vec_id"), col("qe"), col("nrm"), col("m.c_id").as("cell"))
        // queries probe their 2 nearest cells
        val wp = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("c_id"))
        val probes = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qe").as("qa"), col("nrm").as("na"))
          .crossJoin(broadcast(cent))
          .withColumn("dist", expr(l2.format("qa", "ce")))
          .withColumn("prn", row_number().over(wp))
          .filter(col("prn") <= 2)
          .select(col("q_id"), col("qa"), col("na"), col("c_id").as("cell"))
        val wr = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
        broadcast(probes)
          .join(assigned, Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("c", expr("long_dot(qa, qe) / (sqrt(na) * sqrt(nrm))"))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"), col("cell"),
            expr("round(c, 6)").as("cosine"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""$OracleQ,
             |cent AS (SELECT label AS c_id,
             |    list_transform($LaneSeries, j -> CAST(round(
             |      CAST(list_sum(list_transform(list(qe), v -> v[j])) AS BIGINT) / COUNT(*)) AS BIGINT)) AS ce
             |  FROM q GROUP BY label),
             |ad AS (SELECT n.vec_id, n.qe, n.nrm, c.c_id,
             |    CAST(list_sum(list_transform($LaneSeries,
             |      j -> (n.qe[j] - c.ce[j]) * (n.qe[j] - c.ce[j]))) AS BIGINT) AS dist
             |  FROM n CROSS JOIN cent c),
             |assigned AS (SELECT vec_id, qe, nrm, c_id AS cell FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c_id) AS arn FROM ad) z
             |  WHERE arn = 1),
             |pd AS (SELECT n.vec_id AS q_id, n.qe AS qa, n.nrm AS na, c.c_id,
             |    CAST(list_sum(list_transform($LaneSeries,
             |      j -> (n.qe[j] - c.ce[j]) * (n.qe[j] - c.ce[j]))) AS BIGINT) AS dist
             |  FROM n CROSS JOIN cent c WHERE n.vec_id < 5),
             |probes AS (SELECT q_id, qa, na, c_id AS cell FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS prn FROM pd) z
             |  WHERE prn <= 2),
             |res AS (SELECT p.q_id, a.vec_id, a.cell,
             |    ${dotD("p.qa", "a.qe")} / (sqrt(p.na) * sqrt(a.nrm)) AS c
             |  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.q_id),
             |r AS (SELECT q_id, vec_id, cell, c,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn FROM res)
             |SELECT q_id, vec_id, cell, round(c, 6) AS cosine, rn FROM r
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)
    ),

    // ----- cluster quality: per-label centroid cohesion ---------------------
    // The evaluation every embedding-clustering pipeline runs: how tight is
    // each cluster around its centroid (mean / worst member-to-centroid
    // cosine). Centroids are per-dimension means built the scale-safe way —
    // posexplode + groupBy(label, dim), map-side combined, no row ever holds
    // a whole cell — then the tiny centroid table broadcasts back for one
    // narrow pass over the vectors. Cosines quantize to 1e6 integers before
    // the SUM, so the per-label average is an exact-integer sum with one
    // IEEE division — engine-order independent.
    "sim_cluster_stats" -> QuerySpec(
      (s, d) => {
        graft.functions.VectorExpressions.register(s)
        val n = Tables.spread(emb(s, d), "vec_id")
          .select(col("vec_id"), col("label"), expr(quantizeS("embedding")).as("qe"))
          .withColumn("nrm", expr("long_dot(qe, qe)"))
        val cent = n
          .select(col("label"), posexplode(col("qe")).as(Seq("j", "v")))
          .groupBy(col("label"), col("j"))
          .agg(expr("cast(round(sum(v) / count(1)) as bigint)").as("cj"))
          .groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("j"), col("cj")))),
            x => x.getField("cj")).as("ce"))
          .withColumn("cn", expr("long_dot(ce, ce)"))
        n.join(broadcast(cent), Seq("label"))
          .withColumn("ci",
            expr("cast(floor(long_dot(qe, ce) / (sqrt(nrm) * sqrt(cn)) * 1e6 + 0.5) as bigint)"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            expr("round(sum(ci) / count(1) / 1e6, 6)").as("avg_cos"),
            expr("round(min(ci) / 1e6, 6)").as("min_cos"))
          .orderBy(col("label"))
      },
      Some(s"""$OracleQ,
             |cent AS (SELECT label, list_transform($LaneSeries, j -> CAST(round(
             |      CAST(list_sum(list_transform(list(qe), v -> v[j])) AS BIGINT) / COUNT(*)) AS BIGINT)) AS ce
             |  FROM q GROUP BY label),
             |cn AS (SELECT label, ce, ${dotD("ce", "ce")} AS cn FROM cent),
             |ci AS (SELECT n.label,
             |    CAST(floor(${dotD("n.qe", "c.ce")} / (sqrt(n.nrm) * sqrt(c.cn)) * 1e6 + 0.5) AS BIGINT) AS ci
             |  FROM n JOIN cn c ON n.label = c.label)
             |SELECT label, COUNT(*) AS n_vecs,
             |  round(SUM(ci) / COUNT(*) / 1e6, 6) AS avg_cos,
             |  round(MIN(ci) / 1e6, 6) AS min_cos
             |FROM ci GROUP BY label ORDER BY label""".stripMargin)
    )
  )
}
