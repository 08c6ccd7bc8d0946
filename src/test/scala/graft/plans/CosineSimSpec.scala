package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class CosineSimSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("codegen'd cosine_sim is bit-identical to the HOF executable spec") {
    CosineSim.register(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.where(col("vec_id") === 0).select(col("emb").as("q_emb"))
    val both = e.crossJoin(q)
      .select(
        Similarity.cosine(col("emb"), col("q_emb")).as("spec"),
        Similarity.cosineFast(col("emb"), col("q_emb")).as("fast"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // bit-identical, not approximately equal: same fold order, same ops
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim is bit-identical to the HOF spec on adversarial random vectors") {
    CosineSim.register(spark)
    import org.scalacheck.Gen
    import spark.implicits._
    // magnitudes spanning 12 orders + sign flips + zeros: the cases where
    // a different fold order WOULD change the last ulp
    val component = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6),
      Gen.chooseNum(-1e-6, 1e-6),
      Gen.const(0.0))
    val vec = Gen.listOfN(24, component)
    val pairs = Iterator.continually(Gen.zip(vec, vec).sample).flatten
      .take(150).toSeq
    val rows = pairs.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("a", "b")
      .select(
        graft.operators.Similarity.cosine(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("spec"),
        graft.operators.Similarity.cosineFast(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("fast"))
      .collect()
    rows.foreach { r =>
      val s = r.getDouble(0); val f = r.getDouble(1)
      // NaN (zero-norm vectors) must agree as NaN on both paths
      assert(java.lang.Double.doubleToLongBits(s) ===
        java.lang.Double.doubleToLongBits(f), s"spec=$s fast=$f")
    }
  }

  test("cosine_sim rejects non-double-array inputs") {
    CosineSim.register(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    intercept[Exception] {
      e.select(expr("cosine_sim(vec_id, vec_id)")).collect()
    }
  }
}
