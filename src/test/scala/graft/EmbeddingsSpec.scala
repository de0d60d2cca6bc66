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

  test("jacobiEigen recovers a known symmetric spectrum") {
    // A = Q diag(5,2,1) Qᵀ for a hand rotation Q (rows orthonormal)
    val s = 1.0 / math.sqrt(2.0)
    val q = Array(Array(s, s, 0.0), Array(-s, s, 0.0), Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => q(k)(i) * lam(k) * q(k)(j)).sum
    }
    val (vals, vecs) = Embeddings.jacobiEigen(a)
    assert(vals.sorted.zip(Array(1.0, 2.0, 5.0)).forall { case (x, y) => math.abs(x - y) < 1e-10 })
    // each (λ, v): A·v = λ·v
    vals.indices.foreach { i =>
      val av = (0 until 3).map(r => (0 until 3).map(c => a(r)(c) * vecs(i)(c)).sum)
      assert(av.zipWithIndex.forall { case (x, r) => math.abs(x - vals(i) * vecs(i)(r)) < 1e-9 })
    }
  }

  test("embed_pca: deterministic fit; whitened components are unit-variance and uncorrelated") {
    val out = Embeddings.embedPca(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n * Embeddings.PcaDim)
    // the fit sample IS the whole sf0.001 table (< PcaSampleN rows), so
    // the whitened output covariance must be ~identity on it
    val rows = out.groupBy("vec_id")
      .agg(collect_list(struct(col("r"), col("v"))).as("pv"))
      .select(transform(array_sort(col("pv")), p => p.getField("v")).as("y"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = Embeddings.PcaDim
    val m = new Array[Double](d)
    rows.foreach(y => (0 until d).foreach(j => m(j) += y(j)))
    (0 until d).foreach(j => m(j) /= rows.length)
    var maxDiagErr = 0.0; var maxOff = 0.0
    for (i <- 0 until d; j <- i until d) {
      val c = rows.map(y => (y(i) - m(i)) * (y(j) - m(j))).sum / (rows.length - 1)
      if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(c - 1.0))
      else maxOff = math.max(maxOff, math.abs(c))
    }
    assert(maxDiagErr < 0.05, s"diag var off identity by $maxDiagErr")
    assert(maxOff < 0.05, s"off-diagonal correlation $maxOff")
    val again = Embeddings.embedPca(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }
  test("embed_diagnostics flags collapsed and dead dims, clears healthy ones") {
    import spark.implicits._
    // dim 0 healthy, dim 1 constant nonzero (collapsed), dim 2 all-zero
    // (collapsed AND dead), dim 3 mostly zero (dead-share 0.75, alive)
    val emb = Seq(
      (0L, Seq(0.5f, 2.0f, 0.0f, 0.0f)),
      (1L, Seq(-0.5f, 2.0f, 0.0f, 0.0f)),
      (2L, Seq(0.25f, 2.0f, 0.0f, 0.0f)),
      (3L, Seq(-0.25f, 2.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val rep = Embeddings.embedDiagnostics(emb)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rep(0).getAs[Int]("collapsed") == 0)
    assert(rep(0).getAs[Double]("dead_share") == 0.0)
    assert(rep(1).getAs[Int]("collapsed") == 1)
    assert(rep(1).getAs[Double]("mean") == 2.0)
    assert(rep(2).getAs[Int]("collapsed") == 1)
    assert(rep(2).getAs[Double]("dead_share") == 1.0)
    assert(rep(3).getAs[Int]("collapsed") == 0)
    assert(rep(3).getAs[Double]("dead_share") == 0.75)
    // report is one row per dimension, n vectors each
    assert(Embeddings.embedDiagnostics(emb).count() == 4)
  }
  test("embed_drift flags mean shifts and fresh collapses, clears stable dims") {
    import spark.implicits._
    // base: dim0 mean ~0.5, dim1 healthy, dim2 healthy
    val base = Seq(
      (0L, Seq(0.4f, 1.0f, -1.0f)), (1L, Seq(0.6f, -1.0f, 1.0f)),
      (2L, Seq(0.5f, 0.5f, -0.5f)), (3L, Seq(0.5f, -0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    // delta: dim0 shifted by +0.5 (drift), dim1 collapsed to 2.0
    // (fresh collapse), dim2 same distribution (stable)
    val delta = Seq(
      (10L, Seq(0.9f, 2.0f, -1.0f)), (11L, Seq(1.1f, 2.0f, 1.0f)),
      (12L, Seq(1.0f, 2.0f, -0.5f)), (13L, Seq(1.0f, 2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val rep = Embeddings.embedDrift(base, delta)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rep(0).getAs[Int]("drifted") == 1 &&
      rep(0).getAs[Double]("mean_shift") == 0.5)
    assert(rep(1).getAs[Int]("drifted") == 1 &&
      rep(1).getAs[Int]("collapsed_delta") == 1)
    assert(rep(2).getAs[Int]("drifted") == 0)
    // entry plant: dim 1 collapses on the delta carve at sf0.001
    val entry = Embeddings.embedDriftQuery(spark, sf)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(entry(1).getAs[Int]("collapsed_delta") == 1)
    assert(entry(1).getAs[Int]("drifted") == 1)
    assert(entry.values.count(_.getAs[Int]("drifted") == 1) < entry.size / 4,
      "most dims must read stable on a same-encoder carve")
  }
}
