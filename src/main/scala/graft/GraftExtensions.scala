package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}

import graft.dedup.{MinHashShingleSig, MinHashSig, SimHash64, SimHashShingleSig}
import graft.functions.{CosineSimilarity, DotProduct, L2Distance, PackFloats, UnpackFloats}
import graft.lsh.HammingDistance
import graft.text.WinnowFingerprint

/**
 * SQL surface for graft's native Catalyst expressions: registered as
 * real FunctionRegistry entries (NOT UDFs), so `spark.sql("SELECT
 * vec_l2(a, b) ...")` plans the same codegen'd expression the Column
 * API uses — same performance, same semantics, one implementation.
 *
 * Two entry points, one function list:
 *  - `spark.sql.extensions=graft.GraftExtensions` (or
 *    `builder.withExtensions(new GraftExtensions)`) injects at session
 *    build — the Spark-native deployment shape;
 *  - `GraftFunctions.register(spark)` adds them to an existing
 *    session (notebooks, tests).
 */
object GraftFunctions {

  private def castVec(e: Expression): Expression = Cast(e, ArrayType(FloatType))

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  private def arity(es: Seq[Expression], n: Int, fn: String): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  type FunctionDescription = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fd(name: String, clazz: Class[_], usage: String)(
      builder: Seq[Expression] => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in"),
      builder)

  /** Every graft SQL function (the model-bearing LSH coder is Column-API
    * only: its fitted model is session state, not a literal argument). */
  val all: Seq[FunctionDescription] = Seq(
    fd("vec_dot", classOf[DotProduct],
      "vec_dot(a, b) - dot product of two vector columns (double accumulation)") { es =>
      arity(es, 2, "vec_dot"); DotProduct(castVec(es(0)), castVec(es(1)))
    },
    fd("vec_l2", classOf[L2Distance],
      "vec_l2(a, b) - Euclidean distance of two vector columns") { es =>
      arity(es, 2, "vec_l2"); L2Distance(castVec(es(0)), castVec(es(1)))
    },
    fd("vec_cosine", classOf[CosineSimilarity],
      "vec_cosine(a, b) - cosine similarity of two vector columns") { es =>
      arity(es, 2, "vec_cosine"); CosineSimilarity(castVec(es(0)), castVec(es(1)))
    },
    fd("hamming64", classOf[HammingDistance],
      "hamming64(a, b) - Hamming distance of two ARRAY<BIGINT> packed codes") { es =>
      arity(es, 2, "hamming64"); HammingDistance(es(0), es(1))
    },
    fd("minhash_sig", classOf[MinHashSig],
      "minhash_sig(shingles, numPerms) - MinHash signature of an ARRAY<STRING>") { es =>
      arity(es, 2, "minhash_sig"); MinHashSig(es(0), intLit(es(1), "minhash_sig"))
    },
    fd("simhash64", classOf[SimHash64],
      "simhash64(tokens) - 64-bit SimHash of an ARRAY<STRING>") { es =>
      arity(es, 1, "simhash64"); SimHash64(es(0))
    },
    fd("minhash_shingle_sig", classOf[MinHashShingleSig],
      "minhash_shingle_sig(tokens, w, numPerms) - MinHash signature over " +
        "w-shingles of an ARRAY<STRING>, fused (no shingle materialization)") { es =>
      arity(es, 3, "minhash_shingle_sig")
      MinHashShingleSig(es(0), intLit(es(1), "minhash_shingle_sig"),
        intLit(es(2), "minhash_shingle_sig"))
    },
    fd("simhash_shingles", classOf[SimHashShingleSig],
      "simhash_shingles(tokens, w) - 64-bit SimHash over distinct w-shingles " +
        "of an ARRAY<STRING>, fused") { es =>
      arity(es, 2, "simhash_shingles")
      SimHashShingleSig(es(0), intLit(es(1), "simhash_shingles"))
    },
    fd("winnow_fp", classOf[WinnowFingerprint],
      "winnow_fp(text) - winnowing rolling-hash fingerprints of a STRING") { es =>
      arity(es, 1, "winnow_fp"); WinnowFingerprint(es(0))
    },
    fd("regexp_count_fast", classOf[graft.text.RegexpCountFast],
      "regexp_count_fast(text, pattern) - match count without materializing " +
        "matches (pattern must be a literal)") { es =>
      arity(es, 2, "regexp_count_fast"); graft.text.RegexpCountFast(es(0), es(1))
    },
    fd("pack_floats", classOf[PackFloats],
      "pack_floats(vec) - little-endian float32 BINARY of a vector column") { es =>
      arity(es, 1, "pack_floats"); PackFloats(castVec(es(0)))
    },
    fd("unpack_floats", classOf[UnpackFloats],
      "unpack_floats(bin) - vector column from little-endian float32 BINARY") { es =>
      arity(es, 1, "unpack_floats"); UnpackFloats(es(0))
    })

  /** Register every graft function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` hook (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
