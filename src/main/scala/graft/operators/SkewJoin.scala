package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling joins (builder-prompt scale battery; the
  * reference relies on its batch optimizer's range partitioning +
  * `SplitAggregateRule.scala:108` for the agg case).
  *
  * AQE's skew-join (on in GraftSession) re-splits oversized partitions
  * at runtime and handles moderate skew for free; SALTING is the
  * explicit structural fallback for extreme single-key skew — a key
  * carrying 50% of a 100 TB fact table still lands on ONE reducer
  * after an AQE split of the probe side unless the build side is
  * replicated. Salting spreads one hot key over n reducers
  * deterministically at the cost of replicating the (small) build side
  * n×.
  */
object SkewJoin {

  /** Salted inner equi-join: fact rows get a uniform salt in [0, n);
    * the dimension is replicated once per salt value; the join key
    * becomes (key, salt). Result rows are identical to the unsalted
    * join — only the shuffle distribution changes. */
  def salted(fact: DataFrame, dim: DataFrame, key: String, n: Int): DataFrame = {
    require(n >= 1)
    val saltedFact = fact.withColumn("__salt", (rand(42) * n).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
