package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
  ).toDF("a", "b")

  test("vec_dot computes double-precision dot product") {
    val got = df.select(vec_dot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 32.0)
    assert(got(1) === 0.0)
  }

  test("vec_l2 computes euclidean distance") {
    val got = df.select(vec_l2(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - math.sqrt(27.0)) < 1e-12)
    assert(math.abs(got(1) - math.sqrt(2.0)) < 1e-12)
  }

  test("vec_cosine computes cosine similarity") {
    val got = df.select(vec_cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(got(1) === 0.0)
  }

  test("null inputs yield null") {
    val withNull = Seq((Option.empty[Array[Float]], Option(Array(1.0f)))).toDF("a", "b")
    val row = withNull.select(vec_dot(col("a"), col("b"))).collect()(0)
    assert(row.isNullAt(0))
  }

  test("works on the embeddings table (array<float> storage)") {
    val emb = Tables.embeddings(spark, sf).limit(5).cache()
    val self = emb.select(vec_cosine(col("embedding"), col("embedding"))).as[Double].collect()
    self.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }
}
