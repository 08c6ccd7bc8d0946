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

  test("cosine_sim rejects non-double-array inputs") {
    CosineSim.register(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    intercept[Exception] {
      e.select(expr("cosine_sim(vec_id, vec_id)")).collect()
    }
  }
}
