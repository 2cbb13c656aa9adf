package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed build keys.
  *
  * AQE's skew-join handles skew detected at shuffle time
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our
  * sessions); this is the explicit form for keys KNOWN to be hot (the
  * classic null-key / celebrity-entity / default-value skew in training
  * corpora), where pre-splitting beats detect-then-split: the left side
  * scatters each row to one of `saltFactor` sub-keys, the right side
  * replicates each row to all of them, so one hot key's rows land on
  * `saltFactor` reducers instead of one.
  *
  * Left-side salt must be deterministic (no rand()): retried tasks must
  * re-produce the same salt or shuffle replay duplicates rows. We hash a
  * stable per-row discriminator column instead.
  */
object SkewJoin {

  /** Inner equi-join `left(keyL) = right(keyR)` with salting.
    * @param discriminator a left-side column that varies within a key
    *   (a row id, position, or any well-distributed attribute) — hashed
    *   to pick the salt bucket deterministically. */
  def saltedInner(left: DataFrame, keyL: String, discriminator: Column,
      right: DataFrame, keyR: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    val l = left.withColumn("__salt", pmod(hash(discriminator), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, l(keyL) === r(keyR) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
