package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY §2.C C5–C7, C13).
  *
  * Vectors are `array<float>` columns cast to `array<double>` up front so
  * every engine (and the DuckDB oracle) accumulates in double precision in
  * array order — bit-stable dot products. All arithmetic is Catalyst
  * `aggregate`/`zip_with` higher-order functions: codegen'd, no UDFs.
  */
object Vectors {

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in array order (parity with the oracle): a native fused
    * expression (graft.functions.VectorDot, codegen'd single loop) —
    * same left-to-right double accumulation as the previous
    * `aggregate(zip_with(...))` spelling, minus its per-row intermediate
    * array. Inputs are assumed equal-length (embedding columns are). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot(a, b)

  /** L2 norm as sqrt(dot(v, v)) — the same expression shape the oracle
    * uses, so intermediate rounding is identical. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from precomputed norms (precompute per row before a pair
    * join — never recompute norms per candidate pair). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Guard for ITERATIVE fits (k-means/PQ/OPQ Lloyd loops, graph
    * builds): ensure the corpus frame has enough partitions to use the
    * cluster. A single-rowgroup parquet file is unsplittable — Spark
    * scans it as ONE task no matter what maxPartitionBytes says — and
    * an iterative fit then replays its whole compute serially every
    * round (measured: the 512k-vector decade's coarse k-means ran on 2
    * of 32 cores for half an hour). One up-front round-robin shuffle is
    * noise next to even a single Lloyd round over the same rows.
    * Results are partitioning-independent by construction everywhere
    * this is used (sorted collect_lists, per-row argmax, min/avg
    * aggregates — the learned-state-as-data oracles already depend on
    * it), so this changes cost, never output. No-op on frames that are
    * already spread (the 100 TB case: thousands of input splits).
    *
    * ROW-AWARE (round 13): the first cut unconditionally fanned to
    * defaultParallelism, which taxed every small-corpus iterative face
    * with 32-task scheduling overhead per Lloyd round (the round-12
    * driver sweep read the whole k-means family at 2.0–2.6× pin from
    * this one mechanism). Callers that already know the corpus count
    * (every adaptiveK site does) pass it, and the spread target
    * becomes `min(defaultParallelism, ceil(rows / rowsPerTask))` — a
    * 2k-row bench corpus fits in 4 tasks and never fans to 32, while
    * the 512k build still lands on all cores (512k/512 ≫ 32).
    * `rows < 0` (unknown) keeps the conservative full fan-out.
    * Partition count is read off the physical plan's RDD
    * (`queryExecution.toRdd`) — the cached plan later actions reuse —
    * not `.rdd`, which builds a separate deserializer plan just to ask
    * a number. */
  def ensureParallelism(v: DataFrame, rows: Long = -1L,
                        rowsPerTask: Long = RowsPerTask): DataFrame = {
    val cores = v.sparkSession.sparkContext.defaultParallelism
    val want =
      if (rows < 0) cores
      else math.min(cores.toLong,
        math.max(1L, (rows + rowsPerTask - 1L) / rowsPerTask)).toInt
    if (v.queryExecution.toRdd.getNumPartitions * 2 >= want) v
    else v.repartition(want)
  }

  /** KEYED sibling of [[ensureParallelism]] for pipelines whose heavy
    * per-row compute sits immediately above a groupBy/join on `key`:
    * hash-spread the frame by that key, so the exchange this inserts IS
    * the downstream aggregate/join's own exchange (same partitioning —
    * EnsureRequirements adds no second one) and the expensive
    * projection lands post-shuffle, spread across the cluster instead
    * of serialized into a single-rowgroup scan task (round-15: the
    * 16-md5 MinHashes pass over all of sf0.1's shingles ran as ONE
    * 1.8 s task on 32 cores). No-op on already-spread inputs — the
    * 100 TB case, where adding a raw-row shuffle would be a
    * regression, keeps its map-side partial aggregation. Hash
    * repartition, not round-robin: no sort-before-repartition pass,
    * and the key is what downstream clusters on anyway. Output is
    * partitioning-independent everywhere this is used (min/count
    * aggregates, equi-joins). */
  def ensureParallelismBy(v: DataFrame, key: Column): DataFrame = {
    val cores = v.sparkSession.sparkContext.defaultParallelism
    if (v.queryExecution.toRdd.getNumPartitions * 2 >= cores) v
    else v.repartition(cores, key)
  }

  /** Materialize a corpus plan ONCE and return it spread row-aware,
    * plus its row count — the entry idiom of the inline index trainers
    * (round-15). Order matters: checkpoint first (the one unavoidable
    * full evaluation of the plan), count the cheap blocks, THEN
    * repartition — counting the raw plan before checkpointing would
    * evaluate the scan+norm projection twice. The second checkpoint
    * (after the spread) is a block-read + small shuffle, so every
    * downstream pass of the iterative fit reads already-spread blocks
    * with no per-pass exchange. */
  def materializeSpread(plan: DataFrame,
      rowsPerTask: Long = RowsPerTask): (DataFrame, Long) = {
    val first = plan.localCheckpoint(true)
    val n = first.count()
    val spread = ensureParallelism(first, n, rowsPerTask)
    (if (spread eq first) first else spread.localCheckpoint(true), n)
  }

  /** Rows per task the row-aware [[ensureParallelism]] targets. 512
    * matches [[KMeans.TargetCellSize]]'s measured small-work quantum:
    * per-task scheduling overhead (~ms) stays under ~1% of a task that
    * scores 512 × 64-dim vectors per Lloyd round, while any corpus
    * past 16k rows (512·32) still spreads to every local core. */
  val RowsPerTask: Long = 512L

  /** Trainer-side sample cap for the sample-train / encode-all cadence
    * (round-13 verdict items 3/5). Iterative model fits (k-means cells,
    * PQ codebooks) cost Θ(rows × k) PER ROUND, so an inline fit over
    * the full corpus is the piece of an index build that stops scaling
    * first (measured: the 4M IVF-PQ build exceeded a 66-minute window;
    * dedup_semantic_pq's 512k build read 1930 s) — while the models
    * themselves converge from a bounded sample (FAISS documents
    * 39–256 training points per centroid as the useful range; 2^17
    * rows give ≥128 points per centroid at every k this library
    * derives from a capped corpus). ENCODING still touches every row
    * exactly once — that cost is inherent to building any index. Below
    * the cap [[trainSample]] returns the corpus frame itself, so every
    * gate SF and the measured decades through 64k train bit-identically
    * to previous rounds. */
  val TrainSampleCap: Long = 131072L

  /** Deterministic trainer sample: content-keyed (xxhash64 of vec_id,
    * no RNG, same rows every run on the same corpus), kept-fraction
    * sized to ~`cap` rows. Returns the sample frame and its
    * (expected) row count — the `rows` to thread into the fit's
    * [[ensureParallelism]] and k-derivation. `rows <= cap` (or an
    * unknown count) returns the input frame UNCHANGED — identical
    * plan, bit-identical models. */
  def trainSample(v: DataFrame, rows: Long,
      cap: Long = TrainSampleCap): (DataFrame, Long) =
    if (rows < 0 || rows <= cap) (v, rows)
    else {
      val every = (rows + cap - 1L) / cap
      (v.where(pmod(xxhash64(col("vec_id")), lit(every)) === 0), rows / every)
    }

  /** Corpus with `e` (double vector) and `nrm` columns added.
    * DEGENERATE vectors — null or zero-norm (a failed encoder's output,
    * absent from testdata but guaranteed in a real 100 TB corpus) — are
    * dropped by default: a zero norm makes every cosine a division by
    * zero, which under Spark 4's ANSI default THROWS and kills the
    * whole job (probed; VectorEdgeSpec pins the guard). They cannot
    * participate in any similarity operator anyway; pass
    * `dropDegenerate = false` for raw pass-through. */
  def withNorm(df: DataFrame, vecCol: String,
               dropDegenerate: Boolean = true): DataFrame = {
    val e = toDouble(col(vecCol))
    val framed = df.withColumn("e", e).withColumn("nrm", norm(col("e")))
    if (dropDegenerate) framed.where(col("nrm").isNotNull && col("nrm") > 0)
    else framed
  }

  /** Deterministic ±1 random-hyperplane set: `numPlanes` planes of `dim`
    * components, seeded — identical across sessions/executors, so LSH
    * signatures are reproducible (SURVEY §4 determinism rule). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Signature bucket id: bit j set iff dot(v, plane_j) > 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedLit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x + y)

  /** Width cap for the C7 oracle's plane inline: the oracle carries
    * this many seeded planes per table (masked to the rule's width), so
    * any future operating-point retune up to 12 bits replays without
    * re-deriving the oracle text. The ENGINE rule stays far below it —
    * the round-12 512k grid measured a hard codegen cliff past b≈9 (the
    * 4-table×b-plane signature expression falls out of whole-stage
    * codegen: b=10 cost 13.8 s where b=9 cost 2.7 s on the same 64k
    * corpus), so wide signatures are a measured anti-pattern here. */
  val MaxLshBits = 12

  /** Corpus-adaptive LSH signature width for the C7 face: 6 bits at
    * gate scale, 7 bits past n = targetOcc·2^base = 8192 — the
    * MEASURED-best operating point, not the theoretic one. The round-13
    * queue hypothesized constant bucket occupancy (b ~ log2(n)), like
    * the PQ family's adaptive ADC budget; the 8k/64k/512k grid REFUTED
    * it on this corpus geometry: at 512k, constant-occupancy (b=12,r=1)
    * read recall 0.18 at 148 s where the shipped point reads 0.78 at
    * 18 s. On weak-contrast embeddings recall tracks the candidate
    * FRACTION (sign-LSH amplification is mild — see the C5a scaladoc),
    * so the right posture is the PQ one transposed: keep the candidate
    * set a constant ~25% fraction (L·(1+b)/2^b at radius 1) and buy
    * recall with probe locality. Grid, recall@10 (cost flat ±5%
    * except as noted):
    *   n=8k:   (6,0) 0.32 | (7,1) 0.68 | (8,1) 0.62 | (9,1) 0.46
    *   n=64k:  (6,0) 0.42 | (7,1) 0.70 | (8,1) 0.52 | (10,1) 0.34 @5×cost
    *   n=512k: (6,0) 0.38 | (7,1) 0.78 | (9,1) 0.54 | (12,1) 0.18 @8×cost
    * Below the threshold the point IS the previously shipped constant
    * (6 bits, radius 0), so every gate-SF result and the sf1 decade are
    * bit-identical. Exact integer comparison — no floating log2. */
  def adaptiveLshBits(n: Long, base: Int = 6, targetOcc: Int = 128): Int =
    if (n > (targetOcc.toLong << base)) base + 1 else base

  /** Multi-probe radius paired with [[adaptiveLshBits]]: past the same
    * threshold each query also probes the b buckets at Hamming distance
    * 1 from its own signature (Lv et al., VLDB'07) — the recall lever
    * that does not multiply tables. With the +1 width the probe shell
    * holds the candidate fraction at a constant ~L·(1+b)/2^b ≈ 25%, and
    * the grid above measures recall roughly DOUBLING at flat cost at
    * every decade. Probes explode on the QUERY side only
    * (query-set-sized), so the corpus join stays a pure equi-join on
    * (tbl, bucket). Radius 0 below the threshold — gate-identical. */
  def adaptiveLshRadius(n: Long, base: Int = 6, targetOcc: Int = 128): Int =
    if (n > (targetOcc.toLong << base)) 1 else 0
}
