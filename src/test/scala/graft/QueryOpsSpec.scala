package graft

import graft.queries.{PipelineOps, QueryUtil}
import org.apache.spark.sql.functions._

/** Specs for the driver-checkable query surface: pinned semantics for
  * the text/vector primitives (tokens, shingles, Jaccard, MinHash,
  * SimHash, cosine), SparkEntry wiring invariants, and physical-plan
  * assertions (pushdown, broadcast) so plan regressions fail loudly.
  */
class QueryOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  import org.apache.spark.sql.DataFrame

  private def one[T](df: DataFrame): T = df.collect()(0).getAs[T](0)

  test("tokens: whitespace-run split, lower-cased, Python-split parity") {
    import spark.implicits._
    val df = Seq("  Hello   WORLD\tfoo\n", "").toDF("text")
      .select(QueryUtil.tokens(col("text")).as("t"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("hello", "world", "foo"))
    assert(rows(1) == Seq())
  }

  test("shingles3: n-2 word 3-grams, distinct, <3 tokens → empty") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x y z x y z x y z").toDF("text")
      .select(QueryUtil.shingles3(QueryUtil.tokens(col("text"))).as("s"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())
    // 7 positions but only 3 distinct shingles
    assert(rows(2).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("jaccard: exact int/int division") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(QueryUtil.jaccard(col("x"), col("y")).as("j"))
    assert(one[Double](df) == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("SparkEntry wiring: oracle keys ⊆ queries, entry non-empty") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q22 exact dedup groups every doc exactly once") {
    val out = SparkEntry.queries("q22_dedup_exact")(spark, sf)
    val total = one[Long](out.agg(sum("n_docs")))
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs)
  }

  test("q24 MinHash-LSH candidates ⊇ high-Jaccard pairs from q23") {
    val jac = SparkEntry.queries("q23_neardup_jaccard")(spark, sf)
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("q24_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands × 4 rows: P(detect) at j=0.9 is 1-(1-0.9^4)^4 ≈ 0.98 per
    // pair; with deterministic md5 "seeds" the outcome is fixed — assert
    // full containment of the very-high-similarity pairs.
    assert(jac.subsetOf(cand), s"missing: ${jac.diff(cand)}")
  }

  test("q25 SimHash: 32-bit signatures, near-dups agree on most bits") {
    val sig = SparkEntry.queries("q25_simhash")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sig.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    val pairs = SparkEntry.queries("q23_neardup_jaccard")(spark, sf)
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      val ham = sig(a).zip(sig(b)).count { case (x, y) => x != y }
      assert(ham <= 6, s"simhash hamming($a,$b)=$ham")
    }
  }

  test("q73 Hamming-ball join equals brute force and never goes all-pairs") {
    // Completeness + soundness: the banded join's per-doc neighbor
    // roll-up must equal the brute-force Hamming-≤1 neighborhood over
    // the collected q25 signatures (pigeonhole guarantees completeness
    // at radius 1 with 2 bands — verify it holds in practice).
    val sig = SparkEntry.queries("q25_simhash")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val brute = (for {
      (a, sa) <- sig; (b, sb) <- sig
      if a != b && sa.zip(sb).count { case (x, y) => x != y } <= 1
    } yield (a, b)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val df = SparkEntry.queries("q73_simhash_hamming")(spark, sf)
    val rows = df.collect()
    assert(rows.exists(_.getAs[Long]("n_neighbors") > 0),
      "near-dup corpus must produce Hamming-≤1 neighbors")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nbs = brute.getOrElse(id, Array.empty[Long])
      assert(r.getAs[Long]("n_neighbors") == nbs.length, s"doc $id count")
      assert(r.getAs[Long]("min_nb") == (if (nbs.isEmpty) -1L else nbs.min), s"doc $id min")
      assert(r.getAs[Long]("max_nb") == (if (nbs.isEmpty) -1L else nbs.max), s"doc $id max")
    }
    // Plan shape: the self-join must be a shuffled/broadcast equi-join
    // on the band key, never a cartesian product (the collect above
    // already finalized the adaptive plan).
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join in q73 plan:\n$plan")
  }

  test("q74 LSH near-dup: sound vs brute baseline, recall measured, no all-pairs") {
    val brute = SparkEntry.queries("q31_embedding_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = SparkEntry.queries("q74_embedding_neardup_lsh")(spark, sf)
    val lsh = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Soundness: every emitted pair passed the exact cosine verify, so
    // the banded result must be a subset of the brute pair set.
    assert(lsh.subsetOf(brute), s"false positives: ${lsh.diff(brute)}")
    // Recall is MEASURED, not assumed: 4 bands × 4 sign bits at this
    // corpus's low 0.4 threshold sits near 0.5 (hyperplane LSH at 66°
    // angles); assert the floor so a hash regression fails loudly.
    val recall = lsh.size.toDouble / brute.size
    assert(brute.nonEmpty && recall >= 0.35, f"recall $recall%.2f (${lsh.size}/${brute.size})")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join in q74 plan:\n$plan")
  }

  test("no oracle-checked query returns array/map/struct columns (driver checker contract)") {
    // The driver's pandas-based hash compare crashes or miscompares on
    // nested values (q67's postings crash, round 4) — flat scalar
    // columns only. Schema derivation builds each plan at sf0.001
    // without collecting results.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"nested columns in oracle output: ${offenders.mkString(", ")}")
  }

  test("q29 cosine top-k: self-similar clusters rank first on a known vector") {
    import spark.implicits._
    // Synthetic check independent of testdata: nearest neighbor of
    // [1,0] among {[2,0],[0,3],[1,1]} must be [2,0] (cos=1).
    val v = Seq((0L, Seq(1f, 0f)), (1L, Seq(2f, 0f)), (2L, Seq(0f, 3f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val dir = tmpDir("emb")
    v.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = SparkEntry.queries("q29_cosine_topk")(spark, dir)
      .where(col("query_id") === 0 && col("rank") === 1).collect()
    assert(top.head.getAs[Long]("neighbor_id") == 1L)
  }

  test("q26 language ID prefers the language with most stopword hits") {
    import spark.implicits._
    val dir = tmpDir("docs")
    Seq((0L, "the cat and the dog of the house", "en", "s", 30L),
        (1L, "der hund und die katze ist da", "de", "s", 28L),
        (2L, "qqq www eee", "zz", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = SparkEntry.queries("q26_lang_id")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(m("en") == "en" && m("de") == "de" && m("zz") == "unknown")
  }

  test("plan: q02 filter reaches the parquet scan (PushedFilters)") {
    val plan = SparkEntry.queries("q02_filter_range")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no pushdown in plan:\n$plan")
  }

  test("plan: q03/q04 dimension joins broadcast (no fact shuffle join)") {
    for (q <- Seq("q03_broadcast_join", "q04_join_snowflake")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast join")
      assert(!plan.contains("SortMergeJoin"), s"$q: unexpected SMJ")
    }
  }

  test("plan: q01 aggregates partially before the shuffle") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }

  test("plan: q24 self-join reuses one signature exchange (final adaptive plan)") {
    // The expensive shingle→minhash signature pipeline must run ONCE:
    // both self-join sides repartition on the same keys, and AQE's
    // ReuseExchange dedups the identical subtree. Executing first makes
    // the FINAL adaptive plan inspectable (isFinalPlan=true) — a
    // regression here silently doubles q24's cost.
    // collect() (not .write, which re-plans a separate write command) so
    // THIS dataframe's adaptive plan is the one that executes.
    val df = SparkEntry.queries("q24_minhash_lsh")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"plan did not finalize:\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no exchange reuse in final q24 plan:\n$plan")
  }

  test("q53 incremental dedup: batch verdicts are exact and corpus-only") {
    import spark.implicits._
    val df = SparkEntry.queries("q53_incremental_dedup")(spark, sf)
    val rows = df.collect()
    // Exactly the batch slice, one verdict per doc.
    val batchIds = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") % 5 === 0).select("doc_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSet == batchIds)
    // dup rows point at a CORPUS doc (never another batch doc).
    rows.filter(_.getString(1) == "dup").foreach { r =>
      assert(r.getLong(2) % 5 != 0, s"dup_of must be a corpus doc: $r")
    }
    // kept rows carry no dup_of.
    assert(rows.filter(_.getString(1) == "kept").forall(_.isNullAt(2)))
  }

  test("q71 bloom-prefiltered dedup: exact verdicts, native probe, no false negatives") {
    val q = SparkEntry.queries("q71_bloom_dedup")(spark, sf)
    val rows = q.collect()
    // Ground truth driver-side: min corpus doc per 16-token-prefix key.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def key(t: String): String =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).take(16).mkString(" ")
    val corpusMin = docs.filter(_._1 % 5 != 0).groupBy(p => key(p._2))
      .view.mapValues(_.map(_._1).min).toMap
    val expect = docs.filter(_._1 % 5 == 0)
      .map { case (id, t) => id -> corpusMin.get(key(t)) }.toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dup = if (r.isNullAt(r.fieldIndex("dup_of"))) None
        else Some(r.getAs[Long]("dup_of"))
      // Exactness here doubles as the no-false-negative proof: a bloom
      // fn would make a true dup read "kept"; a surviving fp would have
      // been removed by the verify join, never reported.
      assert(dup == expect(id), s"doc $id: got $dup expected ${expect(id)}")
      assert(r.getAs[String]("verdict") == (if (dup.isDefined) "dup" else "kept"))
    }
    assert(rows.exists(_.getAs[String]("verdict") == "dup"),
      "corpus should contain cross-split prefix duplicates")
    // The membership probe is Spark's native bloom expression (codegen),
    // not a scala UDF.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native bloom probe missing:\n$plan")
  }

  test("q72 LM cross-entropy matches a driver-side bigram model") {
    val rows = SparkEntry.queries("q72_lm_perplexity")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
    val allBi = docs.flatMap { case (_, ts) =>
      ts.sliding(2).filter(_.length == 2).map(a => (a(0), a(1)))
    }
    val c2 = allBi.groupBy(identity).view.mapValues(_.length).toMap
    val c1 = allBi.groupBy(_._1).view.mapValues(_.length).toMap
    val v = docs.flatMap(_._2).distinct.length
    val byId = docs.toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = byId(r.getAs[Long]("doc_id"))
      val lls = ts.sliding(2).filter(_.length == 2)
        .map(a => math.log((c2((a(0), a(1))) + 1.0) / (c1(a(0)) + v.toDouble)))
        .toSeq
      assert(r.getAs[Long]("n_bigrams") == lls.length)
      val ce = -lls.sum / lls.length
      assert(math.abs(ce - r.getAs[Double]("cross_entropy")) < 2e-6,
        s"doc ${r.getAs[Long]("doc_id")}: $ce vs ${r.getAs[Double]("cross_entropy")}")
    }
  }

  test("q44 JSON repair fixes the deterministic corruptions") {
    val rows = SparkEntry.queries("q44_json_repair")(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // id%3==2 → untouched (ok, not repaired); id%3∈{0,1} → repaired ok.
    assert(rows.keySet == Set((true, false), (true, true)))
    assert(math.abs(rows((true, true)) - 2 * rows((true, false))) <= 2)
  }

  test("multimodal decode stub classifies payload magic deterministically") {
    val pdf = "%PDF-1.4 x".getBytes("ISO-8859-1")
    val html = "<html></html>".getBytes("UTF-8")
    assert(PipelineOps.decodeStub("u", pdf).magic == "pdf")
    assert(PipelineOps.decodeStub("u", html).magic == "html")
    val m = PipelineOps.decodeStub("u", Array[Byte](1, 2, 3))
    assert(m.magic == "bin" && m.width >= 1 && m.height >= 1)
  }

  test("q47 salted two-phase distinct equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q47_user_stats_salted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id")
      .agg(countDistinct("event_type").cast("int").as("n_types"), count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id")).limit(20).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(salted.sameElements(direct))
  }

  test("salted two-phase distinct handles PageGen's Zipf host skew") {
    import org.apache.spark.sql.functions._
    // The skew-handling shape proven on the Zipf-host corpus (host0 ≈ 7%
    // of rows — the hot key that motivates salting at 10^12 scale).
    val pg = graft.synth.PageGen.generate(spark, 20000).toDF()
      .select(regexp_extract(col("url"), "https://([^/]+)/", 1).as("host"),
        regexp_extract(col("url"), "https://[^/]+/([^/]+)/", 1).as("family"),
        col("url"))
    val phase1 = pg
      .groupBy(col("host"), pmod(xxhash64(col("url")), lit(16)).as("salt"))
      .agg(collect_set(col("family")).as("fams"), count(lit(1)).as("n"))
    val salted = phase1.groupBy("host")
      .agg(size(array_distinct(flatten(collect_list(col("fams"))))).as("n_families"),
           sum("n").as("n_pages"))
      .orderBy(col("n_pages").desc, col("host")).limit(20).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val direct = pg.groupBy("host")
      .agg(countDistinct("family").cast("int").as("n_families"), count(lit(1)).as("n_pages"))
      .orderBy(col("n_pages").desc, col("host")).limit(20).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(salted.sameElements(direct))
    // Zipf skew really present: top host carries >4% of rows.
    assert(salted.head._3 > 800, s"expected hot host, got ${salted.head}")
  }

  test("q86 pruned-broadcast scoring: CE >= full model per doc, equality exists, plan broadcasts") {
    val d1 = "/root/testdata/sf0.001"
    val full = SparkEntry.queries("q72_lm_perplexity")(spark, d1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val df = SparkEntry.queries("q86_lm_broadcast_scoring")(spark, d1)
    val pruned = df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pruned.keySet == full.keySet)
    // Pruning a hapax bigram can only LOWER its probability, so the
    // pruned cross-entropy dominates the full one (6dp-rounding slack).
    pruned.foreach { case (id, ce) =>
      assert(ce >= full(id) - 1e-6, s"doc $id pruned $ce < full ${full(id)}")
    }
    assert(pruned.exists { case (id, ce) => ce > full(id) + 1e-6 },
      "some document must contain a hapax bigram")
    // The scoring joins are broadcasts — the map-only production shape.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "model join must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"scoring must not shuffle-sort:\n$plan")
  }

  test("q87 containment: planted excerpts score 1.0 against their hosts; Jaccard would miss them") {
    import org.apache.spark.sql.functions._
    import graft.queries.QueryUtil._
    val d1 = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q87_containment_dedup")(spark, d1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, na, nb, inter, c) =>
      assert(c <= 1.0 + 1e-9 && inter <= math.min(na, nb))
    }
    // Every planted (host, host+10^6) excerpt pair with enough tokens
    // must be found with containment exactly 1.0 (a true subset
    // survives the df-cap because sizes are computed post-cap).
    val hosts = spark.read.parquet(s"$d1/documents.parquet")
      .where(col("doc_id") % 37 === 0 && size(tokens(col("text"))) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val found = rows.filter { case (a, b, _, _, _, _) => hosts.contains(a) && b == a + 1000000L }
    assert(found.nonEmpty && found.size >= hosts.size - 1, // tolerate one fully-capped host
      s"planted pairs found ${found.size} of ${hosts.size}")
    found.foreach { case (a, _, _, _, _, c) => assert(c == 1.0, s"host $a containment $c") }
    // The motivating case: at least one detected pair whose Jaccard is
    // below the q23/q24 0.5 threshold — containment finds what
    // union-normalized similarity structurally cannot.
    assert(found.exists { case (_, _, na, nb, inter, _) =>
      inter.toDouble / (na + nb - inter) < 0.5 })
  }
}
