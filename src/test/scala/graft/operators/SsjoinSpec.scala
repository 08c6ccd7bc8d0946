package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the round-5 similarity/curation operators: the
  * prefix-filtered exact set-similarity join (completeness vs brute force —
  * the property the prefix theorem promises), decontamination (injected
  * copies found; eval side broadcast), and bigram-LM perplexity (exact
  * integer recomputation in Scala). */
class SsjoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("ssjoinPrefix finds EXACTLY the brute-force Jaccard>=tau pairs") {
    // ground truth: per-doc distinct shingle-hash sets, all-pairs in Scala
    val sets = Dedup.shingleHashRows(Dedup.docsWithInjectedDups(spark, d))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, hs) => (id, hs.map(_._2).toSet) }
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      union = a.size + b.size - inter
      if Dedup.SsjoinTauDen * inter >= Dedup.SsjoinTauNum * union
    } yield (ids(i), ids(j), inter.toLong, union.toLong)).toSet

    val got = Dedup.ssjoinPrefix(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(expected.nonEmpty) // injected dups guarantee hits
  }

  test("prefix length arithmetic is the exact integer ceil") {
    // p = m − ⌈τ·m⌉ + 1 with τ = 4/5; spot the boundary cases
    def p(m: Long): Long = m - ((m * 4 + 4) / 5) + 1
    assert(p(1) === 1); assert(p(5) === 2); assert(p(6) === 2)
    assert(p(10) === 3); assert(p(100) === 21)
    (1L to 500L).foreach { m =>
      val ceil = math.ceil(0.8 * m).toLong
      assert((m * 4 + 4) / 5 === ceil, s"m=$m")
    }
  }

  test("decontaminate flags exactly the injected eval copies on sf0.001") {
    val got = Dedup.decontaminate(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // injected copies: eval docs (id%97=0, id<300) re-keyed +2000000 — each
    // must be flagged against its own source eval doc
    val injected = Set(0L, 97L, 194L, 291L)
      .map(id => (id + 2000000L, id))
    assert(injected.subsetOf(got))
    // and every flagged pair really shares >= threshold distinct shingles
    val sets = Dedup.shingleHashRows(
        graft.Tables.documents(spark, d).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, hs) => (id, hs.map(_._2).toSet) }
    got.foreach { case (t, e) =>
      val tSet = if (t >= 2000000L) sets(t - 2000000L) else sets(t)
      assert(Dedup.DecontamDen * (tSet & sets(e)).size >=
        Dedup.DecontamNum * sets(e).size)
    }
  }

  test("decontaminate broadcasts the eval side (corpus never reshuffles)") {
    val plan = Dedup.decontaminate(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("perplexity NLL recomputes exactly in Scala (integer centi-nats)") {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bigrams = docs.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      toks.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val n12 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => (k, v.length) }
    val nCur = bigrams.groupBy(_._2).map { case (k, v) => (k, v.length) }
    val v = docs.flatMap(_._2.split(" ", -1)).distinct.length
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val nll = -bs.map { case (_, c, n) =>
        math.floor(math.log((n12((c, n)) + 1).toDouble / (nCur(c) + v)) * 100).toLong
      }.sum
      (id, (nll, bs.length.toLong))
    }
    val got = TextAnalysis.perplexity(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(2)))).toMap
    assert(got.size === docs.length)
    expected.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }
}
