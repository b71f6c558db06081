package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, dim 64). Dot products / norms run as codegen'd
  * higher-order functions (`zip_with` + `aggregate`) in DOUBLE precision
  * — matching the oracle's math and keeping everything inside
  * whole-stage codegen; no UDFs.
  *
  * Scale shape:
  *  - q29 broadcast-joins the tiny query set against the full corpus —
  *    the classic brute-force ANN baseline: one scan, no corpus shuffle,
  *    per-partition top-k via window (at true scale: `mapPartitions`
  *    heap + final merge; the window form is Catalyst-visible and
  *    equivalent here).
  *  - q31 is the all-pairs verifier (correctness baseline, O(n²)); the
  *    at-scale path is LSH bucketing (q30): 8 deterministic md5-derived
  *    hyperplanes → 8-bit bucket key → pairs only within a bucket.
  */
object VectorOps {

  type Q = (String, (SparkSession, String) => DataFrame, Option[String])

  /** embedding cast to array<double> with its norm precomputed ONCE per
    * vector — the pair joins below would otherwise recompute both norms
    * for every one of the O(n²) pairs. All math in double on both
    * engines.
    */
  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(s)
    tbl(s, d, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(call_function("vector_dot", col("v"), col("v"))))
  }

  /** Codegen'd indexed dot product (graft.plans.VectorDot) — no zipped
    * array materialized per pair.
    */
  private def dot(a: String, b: String) =
    call_function("vector_dot", col(a), col(b))

  /** Sign bit ('1'/'0') of dot(v, hyperplane p) — the md5-derived
    * deterministic hyperplane family SHARED by q30 (bucket keys) and
    * q74 (banded near-dup): weight for (plane p, dim i) = first md5 hex
    * digit of "p:i" minus 7.5. FP caveat, shared with the oracles: the
    * Spark fold is sequential while DuckDB's grouped sum order is
    * unspecified, so a projection within float-epsilon of 0 could band
    * differently cross-engine — with these integer-derived weights and
    * 64 dims the projections sit far from 0, and three rounds of green
    * q30 rows pin that empirically.
    */
  private def hyperplaneBit(p: Column, v: Column): Column =
    when(aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x * ((ascii(substring(
          md5(concat(p.cast("string"), lit(":"), i.cast("string"))), 1, 1))
          % 16).cast("double") - 7.5)),
      lit(0.0), (acc, x) => acc + x) > 0, lit("1")).otherwise(lit("0"))

  /** Data-derived IVF centroids (replaces round-2's md5-derived ones,
    * whose recall was unrepresentative — BENCH.md measured 1/30
    * single-probe): 8 deterministic seed vectors (vec_id 0..7) refined
    * by ONE Lloyd step under the cosine metric — every vector joins its
    * max-cosine seed, each cell's centroid becomes the element-wise
    * MEAN of its members (empty cells keep their seed). Deterministic,
    * identical construction in the oracle SQL. Scale shape: seeds and
    * centroids are k×dim tiny (broadcast); the Lloyd step is one
    * corpus pass (posexplode → per-(cell,dim) partial-agg mean), the
    * same cost as any k-means iteration.
    */
  private def ivfCentroids(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, d)
    val seeds = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("sv"),
        col("nrm").as("snrm"))
    val a0 = e.select(col("vec_id"), col("v"))
      .join(broadcast(seeds), lit(true))
      .withColumn("cos", call_function("vector_dot", col("v"), col("sv")) / col("snrm"))
    val w0 = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cell").asc)
    val assigned = a0.withColumn("rn", row_number().over(w0)).where(col("rn") === 1)
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
    val means = assigned.groupBy("cell", "i").agg(avg("x").as("w"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("w")))),
        t => t.getField("w")).as("mv"))
    seeds.select("cell", "sv").join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("mv"), col("sv")).as("cv"))
      .withColumn("cnrm", sqrt(call_function("vector_dot", col("cv"), col("cv"))))
  }

  /** IVF coarse quantization: cells ranked by centroid COSINE per vector
    * (dot / centroid norm — the per-vector norm is constant within the
    * ranking; ties break to the lowest cell id, matching the oracle's
    * row_number ordering). `probes = 1` is the storage assignment; a
    * query searches its top-`probes` cells (multi-probe — the recall
    * knob; see BENCH.md scale-path quality table).
    */
  private def ivfAssign(s: SparkSession, d: String, probes: Int = 1,
      centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, d)
    // The Lloyd pass is a full corpus scan: materialize its tiny k×dim
    // result so no query plan embeds (and re-executes) it twice —
    // callers that assign at several probe depths pass ONE shared
    // centroid table in.
    val cents = centroids.getOrElse(ivfCentroids(s, d).localCheckpoint())
    val dots = e.join(broadcast(cents), lit(true))
      .withColumn("cdot", call_function("vector_dot", col("v"), col("cv")) / col("cnrm"))
    val w = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cell").asc)
    dots.withColumn("rn", row_number().over(w)).where(col("rn") <= probes)
      .select("vec_id", "cell", "v", "nrm")
  }

  /** Shared WITH-prefix of the IVF oracle SQL (defines e, the seeded
    * one-Lloyd-step centroids, dotsn, assign) — the exact SQL mirror of
    * `ivfCentroids`/`ivfAssign`.
    */
  private val ivfAssignSql: String =
    """WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding,1)-1 AS i FROM embeddings),
      seed AS (SELECT vec_id AS cell, i, v AS w FROM e WHERE vec_id < 8),
      snrm AS (SELECT cell, sqrt(sum(w*w)) AS nrm FROM seed GROUP BY 1),
      a0c AS (SELECT e.vec_id, seed.cell, sum(e.v * seed.w) AS dot
              FROM e JOIN seed ON e.i = seed.i GROUP BY 1,2),
      a0 AS (SELECT vec_id, cell FROM (
             SELECT a0c.vec_id, a0c.cell,
               row_number() OVER (PARTITION BY a0c.vec_id
                 ORDER BY a0c.dot / snrm.nrm DESC, a0c.cell) AS rn
             FROM a0c JOIN snrm USING (cell)) WHERE rn = 1),
      centm AS (SELECT a0.cell, e.i, avg(e.v) AS w
                FROM a0 JOIN e ON e.vec_id = a0.vec_id GROUP BY 1,2),
      cent AS (SELECT s.cell, s.i, coalesce(c.w, s.w) AS w
               FROM seed s LEFT JOIN centm c ON c.cell = s.cell AND c.i = s.i),
      cnrm AS (SELECT cell, sqrt(sum(w*w)) AS nrm FROM cent GROUP BY 1),
      dots AS (SELECT e.vec_id, cent.cell, sum(e.v * cent.w) AS rawdot
               FROM e JOIN cent ON e.i = cent.i GROUP BY 1,2),
      dotsn AS (SELECT dots.vec_id, dots.cell, dots.rawdot / cnrm.nrm AS dot
                FROM dots JOIN cnrm USING (cell)),
      assign AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
        FROM dotsn) WHERE rn = 1)
    """

  val defs: Seq[Q] = Seq(

    // ---- Brute-force cosine top-k: 10 query vectors × full corpus.
    ("q29_cosine_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = emb(s, d)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        val n = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("nrm").as("nn"))
          .repartition(s.sparkContext.defaultParallelism)
        val scored = n.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", dot("qv", "nv") / (col("qn") * col("nn")))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                           generate_subscripts(embedding,1) AS i FROM embeddings),
             p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                     sum(q.v*n.v) AS dot, sqrt(sum(q.v*q.v)) AS nq, sqrt(sum(n.v*n.v)) AS nn
                   FROM e q JOIN e n ON q.i = n.i
                   WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id
                   GROUP BY 1,2),
             rk AS (SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY dot/(nq*nn) DESC, neighbor_id) AS rank
                    FROM p)
             SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= 5
             ORDER BY query_id, rank""")),

    // ---- LSH bucketing: sign of dot(v, hyperplane_b) for 8 md5-derived
    // deterministic hyperplanes → bucket key; bucket histogram. This is
    // the candidate-generation stage of ANN at scale (pairs only within
    // buckets — no all-pairs join).
    ("q30_lsh_buckets",
      (s, d) => {
        emb(s, d)
          .withColumn("bucket",
            concat_ws("", transform(sequence(lit(0), lit(7)),
              b => hyperplaneBit(b, col("v")))))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec_id"))
          .orderBy("bucket")
      },
      Some("""WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                           generate_subscripts(embedding,1) - 1 AS i FROM embeddings),
             s AS (SELECT vec_id, b.b,
                     sum(v * (CAST(ascii(substr(md5(b.b || ':' || i), 1, 1)) % 16 AS DOUBLE) - 7.5)) AS proj
                   FROM e CROSS JOIN (SELECT unnest(range(8)) AS b) b
                   GROUP BY vec_id, b.b),
             k AS (SELECT vec_id, string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS bucket
                   FROM s GROUP BY vec_id)
             SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(vec_id) AS BIGINT) AS min_vec_id
             FROM k GROUP BY 1 ORDER BY 1""")),

    // ---- IVF cell assignment: 8 deterministic md5-derived centroids;
    // each vector joins its argmax-dot cell. At scale this is the
    // coarse quantizer of IVF-ANN: one narrow pass over the corpus, and
    // subsequent searches touch only one cell (1/k of the data).
    ("q32_ivf_cells",
      (s, d) => ivfAssign(s, d)
        .withColumn("cell", col("cell").cast("long"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec_id"))
        .orderBy("cell"),
      Some(ivfAssignSql +
        """SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
          CAST(min(vec_id) AS BIGINT) AS min_vec_id
          FROM assign GROUP BY 1 ORDER BY 1""")),

    // ---- IVF top-k: queries search ONLY their own cell (the ANN scale
    // path — recall trades against the 8× candidate reduction; the
    // brute-force q29 is its exact-recall verifier).
    ("q33_ivf_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // assign feeds both the query and neighbor sides: materialize it
        // once (same rationale as q24p's `enriched`).
        val assign = ivfAssign(s, d).localCheckpoint()
        val q = assign.where(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("cell"),
            col("v").as("qv"), col("nrm").as("qn"))
        val n = assign.select(col("vec_id").as("neighbor_id"), col("cell"),
          col("v").as("nv"), col("nrm").as("nn"))
        val scored = n.join(broadcast(q), Seq("cell"))
          .where(col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", dot("qv", "nv") / (col("qn") * col("nn")))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(ivfAssignSql +
        """, p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             sum(eq.v*en.v)/(sqrt(sum(eq.v*eq.v))*sqrt(sum(en.v*en.v))) AS cos
           FROM assign q JOIN assign n ON q.cell = n.cell AND q.vec_id <> n.vec_id
           JOIN e eq ON eq.vec_id = q.vec_id
           JOIN e en ON en.vec_id = n.vec_id AND en.i = eq.i
           WHERE q.vec_id < 10
           GROUP BY 1,2),
        rk AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM p)
        SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= 3
        ORDER BY query_id, rank""")),

    // ---- Multi-probe IVF top-k: queries search their top-3 cells
    // instead of one — the recall knob (measured: 1-probe 3%, 3-probe
    // 53% of exact top-3 on this corpus; BENCH.md). Corpus side stays
    // single-assigned; only query fan-out grows.
    ("q39_ivf_multiprobe",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // One Lloyd pass shared by both probe depths, and the corpus
        // assignment materialized once for the join's neighbor side.
        val cents = ivfCentroids(s, d).localCheckpoint()
        val assign = ivfAssign(s, d, centroids = Some(cents)).localCheckpoint()
        val probes = ivfAssign(s, d, probes = 3, centroids = Some(cents))
        val q = probes.where(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("cell"),
            col("v").as("qv"), col("nrm").as("qn"))
        val n = assign.select(col("vec_id").as("neighbor_id"), col("cell"),
          col("v").as("nv"), col("nrm").as("nn"))
        val scored = n.join(broadcast(q), Seq("cell"))
          .where(col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", dot("qv", "nv") / (col("qn") * col("nn")))
          .select("query_id", "neighbor_id", "cos").distinct()
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(ivfAssignSql +
        """, probes AS (SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
             FROM dotsn) WHERE rn <= 3),
        p AS (SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
              FROM probes q JOIN assign n ON q.cell = n.cell AND q.vec_id <> n.vec_id
              WHERE q.vec_id < 10),
        sc AS (SELECT p.query_id, p.neighbor_id,
                 sum(eq.v*en.v)/(sqrt(sum(eq.v*eq.v))*sqrt(sum(en.v*en.v))) AS cos
               FROM p JOIN e eq ON eq.vec_id = p.query_id
               JOIN e en ON en.vec_id = p.neighbor_id AND en.i = eq.i
               GROUP BY 1,2),
        rk AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM sc)
        SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= 3
        ORDER BY query_id, rank""")),

    // ---- LSH-banded embedding near-dup (q31's SCALE PATH, the same
    // closure q73 gives SimHash): 16 md5-derived hyperplanes in 4 bands
    // × 4 sign bits; candidate pairs share ≥1 exact 4-bit band key,
    // then exact cosine ≥ 0.4 verifies. The oracle mirrors the banding
    // procedure bit-for-bit, so a green row pins the implementation
    // EXACTLY; the retrieval quality is MEASURED against the q31 brute
    // baseline and reported, not assumed (QueryOpsSpec: recall 29/59 =
    // 0.49 at this corpus's low 0.4 threshold — random-hyperplane LSH
    // is genuinely weak at 66° angles; production near-dup runs at
    // cos ≥ 0.9 where 4×4 banding recalls ≥0.95, and widens band keys
    // to 16-32 bits so bucket sizes — fixed at 16 per band here, a
    // small-corpus artifact — track corpus size). Shuffles carry
    // (band_id, 4-bit key, vec_id); vectors move only for verified
    // candidates.
    ("q74_embedding_neardup_lsh",
      (s, d) => {
        val e = emb(s, d)
        val sig = e.select(col("vec_id"),
          transform(sequence(lit(0), lit(3)), b =>
            concat_ws("", transform(sequence(lit(0), lit(3)), k =>
              hyperplaneBit(b * 4 + k, col("v"))))).as("bands"))
        val bands = sig.select(col("vec_id"),
          posexplode(col("bands")).as(Seq("band_id", "band_key")))
        val cand = bands.toDF("vid_a", "band_id", "band_key")
          .join(bands.toDF("vid_b", "band_id", "band_key"), Seq("band_id", "band_key"))
          .where(col("vid_a") < col("vid_b"))
          .select("vid_a", "vid_b").distinct()
        cand
          .join(e.select(col("vec_id").as("vid_a"), col("v").as("va"), col("nrm").as("na")), Seq("vid_a"))
          .join(e.select(col("vec_id").as("vid_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vid_b"))
          .withColumn("cos", dot("va", "vb") / (col("na") * col("nb")))
          .where(col("cos") >= 0.4)
          .select("vid_a", "vid_b")
          .orderBy("vid_a", "vid_b")
      },
      Some("""WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                           generate_subscripts(embedding,1) - 1 AS i FROM embeddings),
             s AS (SELECT vec_id, p.p,
                     sum(v * (CAST(ascii(substr(md5(p.p || ':' || i), 1, 1)) % 16 AS DOUBLE) - 7.5)) AS proj
                   FROM e CROSS JOIN (SELECT unnest(range(16)) AS p) p
                   GROUP BY vec_id, p.p),
             k AS (SELECT vec_id, p // 4 AS band_id,
                     string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS band_key
                   FROM s GROUP BY vec_id, p // 4),
             cand AS (SELECT DISTINCT a.vec_id AS vid_a, b.vec_id AS vid_b
                      FROM k a JOIN k b ON a.band_id = b.band_id
                        AND a.band_key = b.band_key AND a.vec_id < b.vec_id),
             cs AS (SELECT c.vid_a, c.vid_b,
                      sum(ea.v*eb.v)/(sqrt(sum(ea.v*ea.v))*sqrt(sum(eb.v*eb.v))) AS cos
                    FROM cand c JOIN e ea ON ea.vec_id = c.vid_a
                    JOIN e eb ON eb.vec_id = c.vid_b AND eb.i = ea.i
                    GROUP BY 1,2)
             SELECT vid_a, vid_b FROM cs WHERE cos >= 0.4
             ORDER BY vid_a, vid_b""")),

    // ---- All-pairs cosine near-dup (embedding near-duplicate detection
    // baseline; ids only — rank order is FP-stable, raw scores are not).
    ("q31_embedding_neardup",
      (s, d) => {
        requireBaselineScale(s, d, "embeddings", "q31_embedding_neardup")
        val e = emb(s, d)
        // Streamed side repartitioned so the O(n²) nested-loop compare
        // parallelizes (a small parquet is otherwise a single split).
        val a = e.select(col("vec_id").as("vid_a"), col("v").as("va"), col("nrm").as("na"))
          .repartition(s.sparkContext.defaultParallelism)
        val b = broadcast(e.select(col("vec_id").as("vid_b"), col("v").as("vb"), col("nrm").as("nb")))
        a.join(b, col("vid_a") < col("vid_b"))
          .withColumn("cos", dot("va", "vb") / (col("na") * col("nb")))
          .where(col("cos") >= 0.4)
          .select("vid_a", "vid_b")
          .orderBy("vid_a", "vid_b")
      },
      Some("""WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                           generate_subscripts(embedding,1) AS i FROM embeddings),
             p AS (SELECT q.vec_id AS vid_a, n.vec_id AS vid_b,
                     sum(q.v*n.v)/(sqrt(sum(q.v*q.v))*sqrt(sum(n.v*n.v))) AS c
                   FROM e q JOIN e n ON q.i = n.i AND q.vec_id < n.vec_id
                   GROUP BY 1,2)
             SELECT vid_a, vid_b FROM p WHERE c >= 0.4 ORDER BY vid_a, vid_b"""))
  )
}
