package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's ingestion jobs re-expressed as verifiable lake queries
  * (SURVEY §2.B). Each drives the corresponding library module over driver
  * testdata so the DuckDB oracle can check the *semantics* — the real
  * write paths live in [[LakeWriter]] / [[Ledger]] and are ScalaTest'd.
  */
object IngestQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** B1: type-dictionary casting (CsvIngest round-trip): stringify typed
    * columns as a headerless CSV would arrive, re-cast per type dict, and
    * aggregate the typed result. */
  def ingestTypecast(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events").select(
      col("event_id").cast("string").as("c0"),
      col("user_id").cast("string").as("c1"),
      date_format(col("ts"), "yyyy-MM-dd").as("c2"),
      col("event_type").as("c3"))
    // type codes: 4=Long, 4=Long, 6=Date, 1=String (ref type dict L90–98)
    val typed = CsvIngest.castByTypeList(raw, Seq(4, 4, 6, 1))
    typed.groupBy(date_format(col("c2"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("c0")).as("id_sum"),
        sum(when(col("c1") % 2 === 0, 1L).otherwise(0L)).as("even_users"))
      .orderBy(col("day"))
  }

  /** B2: filename routing — synthesize landing keys from events, parse
    * them back, route per FilenameRouter (incl. IRREGULAR). */
  def ingestFilenameRoute(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "events").select(
      when(col("event_id") % 17 === 0, lit("BADFILE.TXT"))
        .otherwise(concat(col("event_type"), lit("_"),
          date_format(col("ts"), "yyyyMMdd"), lit("_"),
          lpad((col("event_id") % 86400).cast("string"), 6, "0"),
          lit(".CSV.GZ"))).as("fname"))
    FilenameRouter.route(files)
      .groupBy(col("table_name"), col("route_status"))
      .agg(count(lit(1)).as("files"),
        countDistinct(col("file_date")).as("days"))
      .orderBy(col("table_name"), col("route_status"))
  }

  /** B3: processed-ledger anti-join — pending = all − processed. */
  def ingestLedgerDiff(s: SparkSession, dir: String): DataFrame = {
    val all = t(s, dir, "events")
    val processed = all.where(col("event_id") % 10 < 3)
    Ledger.pending(all, processed, "event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("to_process"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  /** B4: watermark-incremental append — rows newer than the ingested max. */
  def ingestWatermarkAppend(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val ingested = ord.where(col("o_orderkey") % 5 === 0)
    Watermark.newerThanMax(ord, ingested, "o_orderdate")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_day"))
      .orderBy(col("o_orderstatus"))
  }

  /** B5: failure classification — IRREGULAR / OUTOFCONFIG / UNMATCH / OK. */
  def ingestFailureClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val config = Seq(("click", 3), ("view", 3), ("signup", 5), ("purchase", 6))
      .toDF("cfg_type", "expected_cnt")
    val files = t(s, dir, "events").select(col("event_type"), col("event_id"),
      ((col("event_id") % 7) + 1).as("header_cnt"),
      (col("event_id") % 13 === 0).as("irregular"))
    val joined = files.join(broadcast(config), col("event_type") === col("cfg_type"), "left")
    FailureClassifier.classify(joined, col("irregular"), col("header_cnt"), col("expected_cnt"))
      .groupBy(col("event_type"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("status"))
  }

  /** B5b: the persisted failure ledger's query face — classify synthesized
    * landing files, shape them into FAILED_TO_CONVERT rows (header detail
    * for UNMATCH, blanked otherwise — ref :101–103, 316, 349–358), and
    * aggregate per (status, expected layout) the way an operator triages a
    * bad ingest night. */
  def ingestFailureLedger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val config = Seq(
      ("click", "ev_id,ev_type,ts"), ("view", "ev_id,ev_type,ts"),
      ("signup", "ev_id,ev_type,ts,props,val"),
      ("purchase", "ev_id,ev_type,ts,props,val,qty"))
      .toDF("cfg_type", "meta_list")
      .withColumn("expected_cnt", size(split(col("meta_list"), ",")))
    val files = t(s, dir, "events").select(
      concat(col("event_type"), lit("_"), col("event_id").cast("string")).as("fname"),
      col("event_type"),
      ((col("event_id") % 7) + 1).as("header_cnt"),
      (col("event_id") % 13 === 0).as("irregular"))
    val joined = files.join(broadcast(config), col("event_type") === col("cfg_type"), "left")
    val classified = FailureClassifier.classify(
      joined, col("irregular"), col("header_cnt"), col("expected_cnt"))
    val ledger = FailureLedger.shape(classified,
      fname = col("fname"), headerList = lit(""),
      headerCnt = col("header_cnt"),
      metaHeaderList = col("meta_list"), metaHeaderCnt = col("expected_cnt"),
      execTime = lit("1970-01-01 00:00:00"))
    ledger.groupBy(col("status"), col("meta_header_list"))
      .agg(count(lit(1)).as("n_files"),
        countDistinct(col("header_cnt")).as("widths"),
        sum(col("header_cnt")).as("found_cnt_sum"),
        sum(col("meta_header_cnt")).as("meta_cnt_sum"),
        min(col("fname")).as("first_file"),
        max(col("fname")).as("last_file"))
      .orderBy(col("status"), col("meta_header_list"))
  }

  /** B6: layout-changed merge — union-by-name with null-filled columns. */
  def ingestSchemaMerge(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val oldLayout = ord.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newLayout = ord.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    SchemaEvolution.mergeLayouts(Seq(oldLayout, newLayout))
      .groupBy(coalesce(col("o_orderpriority"), lit("(missing)")).as("priority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("priority"))
  }

  /** B7: TRANSFERRED_DATE partition derivation + per-partition stats
    * (what LakeWriter.writePartitioned partitions by). */
  def ingestPartitionDerive(s: SparkSession, dir: String): DataFrame =
    LakeWriter.withTransferredDate(t(s, dir, "events"), "ts")
      .groupBy(col(LakeWriter.PartitionCol))
      .agg(count(lit(1)).as("rows_n"),
        countDistinct(col("user_id")).as("users"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col(LakeWriter.PartitionCol))

  /** B11: CDC upsert — MERGE INTO over orders. Base omits the %10 keys;
    * the changeset touches the %3 keys (deleting the %9 ones, repricing
    * the rest at +10%), so the merge exercises update, delete, AND
    * insert-of-unseen-key in one pass. Output is the post-merge state
    * summarized per order status. */
  def ingestUpsert(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base = ord.where(col("o_orderkey") % 10 =!= 0)
    val changes = ord.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        // plain IEEE multiply — bit-identical on both engines; decimal
        // round() here diverges at half boundaries (Java BigDecimal
        // HALF_UP vs DuckDB's C++ rounding) and poisons the total
        (col("o_totalprice") * 1.1).as("o_totalprice"),
        when(col("o_orderkey") % 9 === 0, "D").otherwise("U").as("op"),
        lit(1L).as("seq"))
    Merge.upsert(base, changes, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        // money totals in integer CENTS: floor(x*100+0.5) is pure IEEE
        // arithmetic (same double both engines) and the integer sum is
        // associative — immune to both rounding-mode and accumulation-
        // order divergence
        sum(floor(col("o_totalprice") * 100 + 0.5)).as("total_cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** B8: zone-sync plan — `aws s3 sync --delete` as two anti-joins. */
  def syncZoneDiff(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val storing = ord.where(col("o_orderkey") % 97 =!= 0)
    val user = ord.where(col("o_orderkey") % 89 =!= 0)
    val p = ZoneSync.plan(storing, user, "o_orderkey")
    val copy = p.toCopy.agg(count(lit(1)).as("n"),
      min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .select(lit("COPY").as("action"), col("n"), col("min_key"), col("max_key"))
    val del = p.toDelete.agg(count(lit(1)).as("n"),
      min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .select(lit("DELETE").as("action"), col("n"), col("min_key"), col("max_key"))
    copy.unionAll(del).orderBy(col("action"))
  }

  /** B13: data expectations — the constraint-validation gate a lake runs
    * after every ingest (the Delta-Live-Tables-expectations / dbt-test
    * shape): each expectation is one aggregate or anti-join over the
    * landed table, reported as (check, violations, total) so the run
    * report can gate promotion to the user zone. Checks chosen to cover
    * the three constraint families: KEY uniqueness (duplicate
    * o_orderkey), REFERENTIAL integrity (lineitem→orders,
    * orders→customer orphans — anti-joins on the co-partition keys),
    * and DOMAIN validity (discount ∈ [0,1], non-positive quantity,
    * empty customer name). Every check is independently
    * pushdown-friendly; the union is check-count-sized. */
  def metaExpectations(s: SparkSession, dir: String): DataFrame = {
    // A "landed batch" with DETERMINISTIC planted violations (the B5
    // pattern — clean testdata would make every check vacuously 0):
    // %101 orders land twice (dup pk), %107 orders are missing (their
    // lineitems orphaned), %103 orders point at a customer that does
    // not exist (fk orphan), %97 lineitems carry a negative quantity,
    // %95 a discount above 1, %89 customers an empty name.
    val o0 = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .where(col("o_orderkey") % 107 =!= 0)
    val orders = o0.unionAll(o0.where(col("o_orderkey") % 101 === 0))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 103 === 0, col("o_custkey") + 1000000000L)
          .otherwise(col("o_custkey")))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        when(col("l_orderkey") % 97 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")).as("l_quantity"),
        when(col("l_orderkey") % 95 === 0, col("l_discount") + 2.0)
          .otherwise(col("l_discount")).as("l_discount"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 89 === 0, lit("")).otherwise(col("c_name"))
          .as("c_name"))
    def row(name: String, violations: DataFrame, total: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("violations"))
        .crossJoin(total.agg(count(lit(1)).as("total")))
        .select(lit(name).as("check_name"), col("violations"), col("total"))
    val dupKeys = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
    val liOrphans = li.join(orders.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val custOrphans = orders.join(cust.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
    row("pk_orders_unique", dupKeys, orders)
      .unionAll(row("fk_lineitem_orders", liOrphans, li))
      .unionAll(row("fk_orders_customer", custOrphans, orders))
      .unionAll(row("dom_discount_range",
        li.where(col("l_discount") < 0 || col("l_discount") > 1), li))
      .unionAll(row("dom_quantity_positive", li.where(col("l_quantity") <= 0), li))
      .unionAll(row("dom_customer_name",
        cust.where(col("c_name").isNull || col("c_name") === ""), cust))
      .orderBy(col("check_name"))
  }
}
