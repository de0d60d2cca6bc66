package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Random-projection (JL) dimensionality reduction. */
class EmbeddingsSpec extends SparkSpecBase {

  test("projection matrix: deterministic, expected-norm scaling") {
    val a = Embeddings.projMatrix(64, 16)
    val b = Embeddings.projMatrix(64, 16)
    assert(a.length == 16 && a.head.length == 64)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // rows are N(0, 1/16): squared norms concentrate around 64/16 = 4
    val norms = a.map(_.map(x => x * x).sum)
    assert(norms.forall(n => n > 1.0 && n < 9.0), norms.mkString(", "))
  }

  test("embed_project: one row per (vec, target dim); JL distance preservation on average") {
    val proj = Embeddings.embedProject(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(proj.count() == n * Embeddings.ProjTargetDim)
    // JL: projected pairwise L2 tracks the original within a loose
    // band ON AVERAGE (16 dims is coarse; individual pairs vary)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .filter(col("vec_id") < 30)
    val p = proj.filter(col("vec_id") < 30)
      .groupBy("vec_id").agg(collect_list(struct(col("r"), col("v"))).as("pv"))
      .select(col("vec_id"),
        expr("transform(array_sort(pv, (a, b) -> a.r - b.r), s -> s.v)").as("p"))
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        expr("sqrt(aggregate(zip_with(x.e, y.e, (u, w) -> (u - w) * (u - w)), 0d, (s, z) -> s + z))").as("d"))
    val ppairs = p.as("x").join(p.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        expr("sqrt(aggregate(zip_with(x.p, y.p, (u, w) -> (u - w) * (u - w)), 0d, (s, z) -> s + z))").as("pd"))
    val ratio = pairs.join(ppairs, Seq("a", "b"))
      .agg(avg(col("pd") / col("d"))).head().getDouble(0)
    assert(ratio > 0.7 && ratio < 1.3, s"mean distance ratio $ratio")
    proj.unpersist()
  }
}
