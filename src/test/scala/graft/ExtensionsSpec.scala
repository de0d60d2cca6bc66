package graft

import org.apache.spark.sql.functions._

import graft.dedup.SignatureExprs
import graft.functions.VectorFunctions
import graft.text.Fingerprint

/**
 * SQL surface parity: the registered functions must plan the SAME
 * native expressions as the Column API — identical results, no UDF.
 */
class ExtensionsSpec extends SparkSpecBase {

  GraftFunctions.register(spark)

  test("vector functions from SQL equal the Column API") {
    val emb = Tables.embeddings(spark, sf).limit(50).cache()
    emb.createOrReplaceTempView("e_ext")
    val viaSql = spark.sql(
      """SELECT x.vec_id AS a, y.vec_id AS b,
        |  vec_l2(x.embedding, y.embedding) AS l2,
        |  vec_dot(x.embedding, y.embedding) AS dot,
        |  vec_cosine(x.embedding, y.embedding) AS cos
        |FROM e_ext x JOIN e_ext y ON x.vec_id < y.vec_id""".stripMargin)
    val viaCol = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        VectorFunctions.vec_l2(col("x.embedding"), col("y.embedding")).as("l2"),
        VectorFunctions.vec_dot(col("x.embedding"), col("y.embedding")).as("dot"),
        VectorFunctions.vec_cosine(col("x.embedding"), col("y.embedding")).as("cos"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
    emb.unpersist()
  }

  test("signature and fingerprint functions from SQL equal the Column API") {
    val docs = Tables.documents(spark, sf).limit(50).cache()
    docs.createOrReplaceTempView("d_ext")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  minhash_sig(split(lower(text), ' '), 16) AS mh,
        |  simhash64(split(lower(text), ' ')) AS sh,
        |  winnow_fp(text) AS fp
        |FROM d_ext""".stripMargin)
    val toks = split(lower(col("text")), " ")
    val viaCol = docs.select(col("doc_id"),
      SignatureExprs.minhash_sig(toks, 16).as("mh"),
      SignatureExprs.simhash64(toks).as("sh"),
      Fingerprint.doc_fingerprints(col("text")).as("fp"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
    docs.unpersist()
  }

  test("pack/unpack roundtrip and hamming from SQL") {
    val rt = spark.sql(
      "SELECT unpack_floats(pack_floats(array(1.5, -2.25, 0.0))) AS v").head()
    assert(rt.getSeq[Float](0) == Seq(1.5f, -2.25f, 0.0f))
    val h = spark.sql(
      "SELECT hamming64(array(CAST(0 AS BIGINT)), array(CAST(7 AS BIGINT))) AS h").head()
    assert(h.getLong(0) == 3L)
  }

  test("the spark.sql.extensions entry point wires the same registry") {
    // a fresh session built through the extensions hook (the shared
    // spec session pre-exists, so exercise the injection path on a
    // sibling session of the same context)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // the injection list is exactly the shared function list
    assert(GraftFunctions.all.map(_._1.funcName).toSet ==
      Set("vec_dot", "vec_l2", "vec_cosine", "hamming64", "minhash_sig",
        "simhash64", "minhash_shingle_sig", "simhash_shingles",
        "winnow_fp", "regexp_count_fast", "pack_floats", "unpack_floats"))
  }

  test("regexp_count_fast equals size(regexp_extract_all) from SQL and the Column API") {
    val docs = Tables.documents(spark, sf).limit(100).cache()
    docs.createOrReplaceTempView("d_rc")
    val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    val viaSql = spark.sql(
      s"SELECT doc_id, regexp_count_fast(lower(text), '${pat.replace("\\", "\\\\")}') AS n FROM d_rc")
    val builtin = docs.select(col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0))).as("n"))
    val viaCol = docs.select(col("doc_id"),
      graft.text.RegexpCount.re_count(lower(col("text")), pat).as("n"))
    assert(viaSql.exceptAll(builtin).count() == 0 && builtin.exceptAll(viaSql).count() == 0)
    assert(viaCol.exceptAll(builtin).count() == 0 && builtin.exceptAll(viaCol).count() == 0)
    // zero-width-adjacent and empty-string edges match the built-in too
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "aaa bbb"), (3L, "!!!"), (4L, "a1b2")).toDF("doc_id", "text")
    for (p <- Seq(pat, "^a", "\\ba\\w*", "a*", "(?i)AAA")) {
      val a = graft.text.RegexpCount.re_count(col("text"), p)
      val b = size(regexp_extract_all(col("text"), lit(p), lit(0)))
      assert(edge.filter(a =!= b).count() == 0, s"pattern '$p' disagrees with the built-in")
    }
    docs.unpersist()
  }

  test("bad arity and non-literal numPerms fail loudly") {
    intercept[Exception] { spark.sql("SELECT vec_l2(array(1.0))").head() }
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(rand() * 4 AS INT))").head()
    }
  }
}
