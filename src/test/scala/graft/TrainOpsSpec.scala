package graft

import org.apache.spark.sql.functions._

/** Training-sequence operators: window coverage/overlap invariants and
  * sampling monotonicity beyond the hash oracle.
  */
class TrainOpsSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q57: windows tile every document with stride-40 starts and ≤50-token spans") {
    import spark.implicits._
    val rows = SparkEntry.queries("q57_token_windows")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    val docToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(lower(col("text")), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (doc, ws) =>
      val n = docToks(doc)
      val sorted = ws.sortBy(_._2)
      // win_ids are 0..k contiguous; all full-size except possibly the last.
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      sorted.init.foreach { case (_, _, len) => assert(len == 50) }
      val (_, lastId, lastLen) = sorted.last
      assert(lastId * 40 + lastLen == n || lastLen == 50,
        s"doc $doc: last window [$lastId, $lastLen] vs n=$n")
      // Coverage: every token index falls in some window.
      assert(lastId * 40 + lastLen >= n)
    }
  }

  test("q58: kept counts track the 80/50/20 rates and sampling is doc_id-deterministic") {
    val m = SparkEntry.queries("q58_stratified_sample")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (enN, enK) = m("en")
    assert(enK.toDouble / enN > 0.6 && enK.toDouble / enN < 0.95)
    m.filterKeys(l => l != "en" && l != "de").values.foreach { case (n, k) =>
      assert(k.toDouble / n < 0.45, s"non-en/de rate too high: $k/$n")
    }
    // Determinism: identical across invocations.
    val again = SparkEntry.queries("q58_stratified_sample")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == again)
    assert(m.nonEmpty)
  }

  test("q60: eval shingle set broadcasts; contamination flags are coherent") {
    val df = SparkEntry.queries("q60_decontamination")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval side must broadcast (map-side semi-join over the corpus):\n$plan")
    val rows = df.collect()
    // Eval docs excluded; flags match counts.
    assert(rows.forall(_.getLong(0) % 50 != 0))
    assert(rows.forall(r => r.getBoolean(2) == (r.getLong(1) > 0)))
    // The tiny shared vocabulary makes overlap common — both classes
    // must be present for the check to be meaningful.
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }

  test("q75: packing offsets are contiguous, spans coherent, prefix-sum windows bucketed") {
    val df = SparkEntry.queries("q75_sequence_packing")(spark, sf)
    val rows = df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_toks"),
      r.getAs[Long]("tok_offset"), r.getAs[Long]("seq_first"),
      r.getAs[Long]("seq_last"), r.getAs[Long]("n_seqs")))
    assert(rows.nonEmpty)
    // Contiguity: each doc starts exactly where the previous ended —
    // the two-level prefix sum equals the sequential definition.
    rows.sliding(2).foreach { case Array((_, n, off, _, _, _), (d2, _, off2, _, _, _)) =>
      assert(off2 == off + n, s"offset gap before doc $d2")
    }
    assert(rows.head._3 == 0L, "first doc starts at offset 0")
    rows.foreach { case (d, n, off, sf0, sl, ns) =>
      assert(sf0 == off / 128, s"doc $d seq_first")
      assert(sl == (off + math.max(n, 1) - 1) / 128, s"doc $d seq_last")
      assert(ns == sl - sf0 + 1 && ns >= 1, s"doc $d n_seqs")
    }
    // A doc longer than L must span >1 sequence somewhere in the corpus.
    assert(rows.exists(_._6 > 1), "corpus should contain multi-sequence docs")
    // Scale guard: the corpus-sized window must be PARTITIONED (by
    // bucket); only the tiny bucket-totals window may be global.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(bucket"),
      s"expected the per-doc cumsum window to be bucket-partitioned:\n$plan")
  }

  test("q59: mixture weights are positive and sum to ~1") {
    val ws = SparkEntry.queries("q59_mixture_weights")(spark, sf)
      .collect().map(_.getDouble(2))
    assert(ws.forall(_ > 0))
    assert(math.abs(ws.sum - 1.0) < 1e-4, s"weights sum ${ws.sum}")
  }

  test("q80: per-host cap keeps exactly min(K, host size), ranks are a 1..n permutation") {
    val d1 = "/root/testdata/sf0.01" // enough docs that hosts exceed the cap
    val rows = SparkEntry.queries("q80_host_cap")(spark, d1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (host, hs) =>
      val ranks = hs.map(_._3).sorted
      assert(ranks.sameElements(1 to hs.length), s"$host ranks not a permutation")
      assert(hs.count(_._4) == math.min(10, hs.length), s"$host kept count")
      hs.foreach { case (_, _, rk, kept) => assert(kept == (rk <= 10)) }
    }
    // The planted Zipf head actually exceeds the cap (the case the
    // operator exists for) and some tail hosts fit entirely under it.
    val byHost = rows.groupBy(_._2).view.mapValues(_.length)
    assert(byHost("h0") > 100)
    assert(byHost.values.exists(_ <= 10))
  }

  test("q84: algebraic top-K partial selects exactly q80's kept set") {
    val d1 = "/root/testdata/sf0.01"
    val partial = SparkEntry.queries("q84_host_cap_topk")(spark, d1)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val window = SparkEntry.queries("q80_host_cap")(spark, d1)
      .collect().filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getString(1))).sorted
    // Row-for-row: the bounded-heap partial + merge is EQUIVALENT to the
    // global per-host sort window, at a fraction of the shuffle volume.
    assert(partial.sameElements(window))
    // And it really capped: no host exceeds K, the Zipf head hits it.
    val byHost = partial.groupBy(_._2).view.mapValues(_.length)
    assert(byHost.values.max <= 10)
    assert(byHost("h0") == 10)
  }

  test("q88 DSIR weights: raw pool only, flags consistent, matches a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    import graft.queries.QueryUtil._
    val d1 = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q88_dsir_weights")(spark, d1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, lw, flag) =>
      assert(id % 50 != 0, s"target doc $id must not be scored")
      assert(n > 0 && !lw.isNaN && !lw.isInfinite)
      assert(flag == (lw > 0))
    }
    // Independent recomputation of one document's weight from raw
    // token counts (driver-side, different aggregation path).
    val toks = spark.read.parquet(s"$d1/documents.parquet")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 7)
      (java.lang.Long.parseLong(hex, 16) % 128).toInt
    }
    val bt = toks.map { case (id, t) => (id, bucket(t)) }
    val target = bt.filter(_._1 % 50 == 0); val raw = bt.filter(_._1 % 50 != 0)
    val ct = target.groupBy(_._2).view.mapValues(_.length).toMap
    val cr = raw.groupBy(_._2).view.mapValues(_.length).toMap
    val (tt, tr) = (target.length.toDouble, raw.length.toDouble)
    val lrs = (0 until 128).map(b => b ->
      (math.log((ct.getOrElse(b, 0) + 1.0) / (tt + 128)) -
       math.log((cr.getOrElse(b, 0) + 1.0) / (tr + 128)))).toMap
    val someDoc = rows.head._1
    val expect = raw.filter(_._1 == someDoc).map(x => lrs(x._2)).sum
    val got = rows.find(_._1 == someDoc).get._3
    assert(math.abs(got - expect) < 1e-4, s"doc $someDoc: $got vs $expect")
  }

  test("q93 BPE pair counts: matches a driver-side recomputation, tie-cut deterministic") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q93_bpe_pair_counts")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.size == 20)
    // Independent recomputation: same pre-tokenizer regex, plain Scala.
    val pre = "'(?:[sdmt]|ll|ve|re)|[a-z]+|[0-9]|[^\\sa-z0-9']+".r
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0)).foreach { text =>
        val toks = pre.findAllIn(text.toLowerCase).toArray
        toks.indices.dropRight(1).foreach { i =>
          val p = toks(i) + " " + toks(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(rows == expect, s"got ${rows.take(3)} vs ${expect.take(3)}")
    // The cut must be deterministic even when the 20th count ties:
    // every excluded pair with the cut count sorts lexicographically
    // AFTER every included one.
    val cut = rows.last._2
    val includedAtCut = rows.filter(_._2 == cut).map(_._1)
    val excludedAtCut = counts.toSeq
      .filter { case (p, n) => n == cut && !rows.exists(_._1 == p) }.map(_._1)
    excludedAtCut.foreach { e =>
      includedAtCut.foreach(i => assert(i < e, s"tie-cut not lexicographic: $i vs $e"))
    }
  }
}
