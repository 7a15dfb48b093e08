package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KenLM-style log-prob quantization (Heafield, "KenLM: Faster and
  * Smaller Language Model Queries", WMT 2011, §3 "Quantization"; the
  * `build_binary -q` path): replace each float log-prob in the LM table
  * with a small bin index into a 2^bits-entry codebook, built by
  * EQUAL-FREQUENCY binning of the sorted values with each bin coded as
  * its member mean. An 8-bit code turns a 100 GB float column into a
  * 25 GB byte column (plus 2 KB of codebook) with almost no scoring
  * drift, because the bins are dense exactly where the mass is.
  *
  * Spark-first spelling, sized for an LM frame with billions of rows:
  * the bin CUTS come from a mergeable `percentile_approx` sketch (one
  * map-side-combined pass, never a global sort — the ntile spelling
  * would shuffle the whole LM into one window partition), documents
  * assign to bins by comparing against the broadcast cut array, and the
  * codebook is a 2^bits-row aggregate joined back by broadcast.
  */
object LmQuant {

  /** Adds `bin` (int code, 0-based) and `q` (the codebook value) for
    * `lpCol` to `df`. Ties at a cut go to the lower bin (strict `<`
    * comparison — deterministic, engine-stable). `accuracy` is the
    * percentile-sketch accuracy knob (higher = tighter cuts). */
  def quantize(df: DataFrame, lpCol: String, bits: Int,
               accuracy: Int = 10000): DataFrame = {
    require(bits >= 1 && bits <= 16, s"quantize needs 1..16 bits, got $bits")
    val nBins = 1 << bits
    // the input feeds three consumers (cut sketch, codebook aggregate,
    // final join) — a scoped persist runs the LM derivation once, and
    // the cache is LM-bounded (vocabulary-scale), never corpus-bounded
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(df.sparkSession, in)
    val fracs = (1 until nBins).map(i => lit(i.toDouble / nBins))
    val cuts = in.agg(
      percentile_approx(col(lpCol), array(fracs: _*), lit(accuracy)).as("__cuts"))
    val binned = in.crossJoin(broadcast(cuts))
      .withColumn("bin", size(filter(col("__cuts"), c => c < col(lpCol))))
      .drop("__cuts")
    val codebook = binned.groupBy(col("bin")).agg(avg(col(lpCol)).as("q"))
    binned.join(broadcast(codebook), Seq("bin"))
  }

  /** Bytes for a quantized table of `rows` entries at `bits` per code —
    * the storage-accounting face the spec pins (codebook itself is
    * 2^bits doubles, constant). */
  def codeBytes(rows: Long, bits: Int): Long = (rows * bits + 7) / 8
}
