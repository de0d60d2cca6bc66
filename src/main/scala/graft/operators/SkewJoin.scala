package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys (SURVEY §4): the skewed (big) side
 * scatters each row deterministically across `saltFactor` sub-keys via
 * a full-row hash; the small side replicates `saltFactor`x. The join
 * key becomes (key, salt), so a hot key's rows spread over
 * `saltFactor` reducers instead of one.
 *
 * AQE's skew-join handles sort-merge cases adaptively; explicit
 * salting remains the tool when the skew is known up front (e.g. a
 * degenerate dedup bucket or a celebrity key) or the join is not
 * AQE-splittable. Correctness: every (bigRow, smallRow) match occurs
 * exactly once — the big row lands in one salt, and the small side
 * has exactly one replica with that salt.
 */
object SkewJoin {

  val SaltCol = "_graft_salt"

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val bigSalted = big.withColumn(SaltCol,
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val smallReplicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallReplicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
