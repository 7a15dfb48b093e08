package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §5).
  *
  * AQE's skew-join handling splits oversized SORT-MERGE join partitions
  * automatically, but it cannot help when the build side must replicate
  * (broadcast-miss hot keys) or when a single key dwarfs the rest so
  * badly that even split partitions stall. Salting is the explicit
  * remedy: spread the hot side over `saltFactor` sub-keys, replicate the
  * small side once per salt, join on (key, salt).
  *
  * The salt is derived from a STABLE hash of the row — never from
  * `rand()`/`spark_partition_id()` — so task retries recompute the same
  * assignment (the determinism rule every shuffle key in this repo
  * follows).
  */
object Skew {

  /** Equi-join `large` with `small` on `key`, spreading each of
    * `large`'s keys over `saltFactor` sub-partitions. `small` is
    * replicated `saltFactor`x, so keep it broadcast-sized or the factor
    * modest. Semantically identical to `large.join(small, key, joinType)`
    * for inner/left joins on a unique-keyed small side.
    *
    * The default salt hashes the whole row, which cannot spread rows
    * that are BYTE-IDENTICAL duplicates (they all hash alike). When the
    * hot key is duplicate-heavy, pass a custom `salt` — e.g.
    * `rand(seed) * saltFactor` — trading retry determinism for spread.
    * Any custom salt is null-coalesced and pmod-normalized into
    * [0, saltFactor) so an unbounded or null-producing expression can
    * never silently drop rows. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner",
                 salt: Option[Column] = None): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be positive: $saltFactor")
    val saltCol = pmod(
      coalesce(salt.getOrElse(xxhash64(large.columns.toSeq.map(col): _*))
        .cast("long"), lit(0L)),
      lit(saltFactor.toLong))
    val salted = large.withColumn("__salt", saltCol)
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Query face (`skew_salted_join`): the salted join demonstrated on a
    * synthetically hot key — ~3/4 of lineitem collapses onto hot_key 0,
    * the worst case for an unsalted shuffle join (one reducer owns the
    * key). The dimension side is a 50-row group table, so replication
    * ×saltFactor stays trivially broadcast-sized while the fact side's
    * hot key spreads over 8 sub-partitions. Oracle-checked: salting must
    * be invisible in the results. */
  def skewSaltedJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val large = graft.sources.Tables(s, dir, "lineitem").select(
      when(col("l_orderkey") % 4 =!= 0, lit(0L))
        .otherwise(col("l_partkey") % 50).as("hot_key"),
      col("l_extendedprice"))
    val small = graft.sources.Tables(s, dir, "part")
      .groupBy((col("p_partkey") % 50).as("hot_key"))
      .agg(min(col("p_type")).as("grp_type"))
    saltedJoin(large, small, "hot_key", saltFactor = 8)
      .groupBy(col("grp_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("grp_type"))
  }
}
