package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The per-market orchestration loop — reference main.py:152-201: for
  * each market, restore-or-init the store, gate on freshness, ingest +
  * merge, resample the period outputs, summarize, and render one report
  * across all markets.
  *
  * Engine posture: one market = one composed Spark job graph over a
  * directory of pre-fetched day-bar CSVs (the network fetch stays outside
  * the engine; see ListAdapters). Everything here reuses the operator
  * library — `Pipeline.dailySlice` (validate/resample), `Merge
  * .upsertIntoPath` (K1 partition-scoped MERGE), `Report` (A2-A6 + K7) —
  * so the lifecycle adds sequencing, not new semantics.
  */
object Lifecycle {

  /** One market's run parameters (module_map + EXPECTED_MIN_STOCKS,
    * main.py:142-151; FORCE date range main.py:163-168). `asOf` is the
    * injected "today" so runs are deterministic and testable.
    *
    * `startDate`/`endDate` (inclusive, ISO) scope the ingest window —
    * the hot/cold backfill semantics the reference intends but never
    * wires (main.py:15-16 FORCE_START_DATE/END_DATE are dead config;
    * the working contract is per-market hardcoded epochs, e.g.
    * downloader_tw.py:80 hot=2023-01-01 / cold=1993-01-04). A "hot"
    * run sets startDate to the hot epoch; a cold backfill widens it.
    * None = unbounded on that side.
    */
  final case class MarketConfig(
      marketId: String,
      csvDir: String,
      warehouseRoot: String,
      expectedMinSymbols: Long,
      asOf: String,
      gapDays: Int = 14,
      gapSince: String = "2024-01-01",
      useSnapshot: Boolean = false,
      startDate: Option[String] = None,
      endDate: Option[String] = None)

  /** One market's run outcome (get_db_summary shape, main.py:113-135). */
  final case class MarketSummary(
      market: String,
      expected: Long,
      success: Long,
      coverage: Double,
      status: String,
      endDate: String,
      totalRows: Long,
      nRejected: Long,
      ranSync: Boolean)

  def pricesPath(cfg: MarketConfig): String =
    s"${cfg.warehouseRoot}/${cfg.marketId}/prices"

  private val rejectionSchema = StructType(Seq(
    StructField("key", StringType), StructField("reason", StringType)))

  /** Freshness gate (check_needs_update, main.py:100-111): sync iff the
    * store is absent, empty, or its MAX(date) predates `asOf`. Only the
    * 1-row max aggregate runs; a missing path is "needs update", any
    * other failure propagates (same posture as Merge.upsertIntoPath).
    */
  def needsUpdate(spark: SparkSession, path: String, asOf: String): Boolean =
    try {
      val mx = spark.read.parquet(path).agg(max(col("date"))).first()
      mx.isNullAt(0) || mx.getDate(0).toString < asOf
    } catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "PATH_NOT_FOUND" => true
    }

  /** One market through the full loop: freshness gate → CSV ingest →
    * validation gates → MERGE of the valid day bars into the prices
    * store (version = ingest day, so re-running a day is idempotent) →
    * W/M/Y period outputs + audit row → summary computed FROM THE STORE
    * (the reference summarizes the database, not the batch —
    * main.py:113-124).
    */
  def runMarket(spark: SparkSession, cfg: MarketConfig): (MarketSummary, DataFrame) = {
    val prices = pricesPath(cfg)
    // With useSnapshot, the prices store is a transactional snapshot
    // table (sources.Snapshot): merges publish atomically, a crashed run
    // never half-rewrites the store, re-runs are idempotent versions.
    def readStore(): Option[DataFrame] =
      if (cfg.useSnapshot)
        graft.sources.Snapshot.latestVersion(prices)
          .map(_ => graft.sources.Snapshot.read(spark, prices))
      else
        try Some(spark.read.parquet(prices))
        catch {
          case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => None
        }
    val ran = readStore() match {
      case None => true
      case Some(df) =>
        val mx = df.agg(max(col("date"))).first()
        mx.isNullAt(0) || mx.getDate(0).toString < cfg.asOf
    }
    val rejections =
      if (!ran) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rejectionSchema)
      else {
        // Backfill window clamp BEFORE validation: the date predicates
        // sit directly on the scan (pushed to the reader; at warehouse
        // scale, to partition pruning), so a scoped hot run never reads
        // or re-validates history, and the merge below only rewrites
        // date partitions inside the window.
        val bars = Seq(
            cfg.startDate.map(d => col("date") >= to_date(lit(d))),
            cfg.endDate.map(d => col("date") <= to_date(lit(d))))
          .flatten
          .foldLeft(Pipeline.ingestCsvDir(spark, cfg.csvDir))(_.filter(_))
        val slice = Pipeline.dailySlice(bars, cfg.gapDays, cfg.gapSince)
        val validBars = Quality.excludeRejected(
          bars.na.drop(Seq("open", "high", "low", "close")),
          col("symbol"), slice.rejections)
          .withColumn("version",
            datediff(to_date(lit(cfg.asOf)), to_date(lit("1970-01-01"))).cast("long"))
        if (cfg.useSnapshot)
          graft.sources.Snapshot.merge(validBars, prices,
            Seq("symbol", "date"), "version", "date")
        else
          Merge.upsertIntoPath(validBars, prices,
            Seq("symbol", "date"), "version", "date")
        Pipeline.writeSlice(slice, s"${cfg.warehouseRoot}/${cfg.marketId}", cfg.marketId)
        slice.rejections
      }
    val store = readStore().get
    val stats = Report.summaryStats(store, col("symbol"), col("date")).first()
    val success = stats.getLong(0)
    val endDate = Option(stats.getDate(1)).map(_.toString).getOrElse("N/A")
    val totalRows = stats.getLong(2)
    val coverage = math.rint(success * 10000.0 / math.max(cfg.expectedMinSymbols, 1L)) / 100.0
    val summary = MarketSummary(
      market = cfg.marketId.toUpperCase,
      expected = cfg.expectedMinSymbols,
      success = success,
      coverage = coverage,
      status = if (coverage >= 80) "OK" else "LOW",
      endDate = endDate,
      totalRows = totalRows,
      nRejected = rejections.count(),
      ranSync = ran)
    (summary, rejections)
  }

  /** The whole fleet: run every market, then render ONE report across
    * all summaries + the union of rejection lists (main.py:196-201 →
    * notifier.send_stock_report_email).
    */
  def run(spark: SparkSession, configs: Seq[MarketConfig]): (Seq[MarketSummary], String) = {
    val results = configs.map(cfg => (cfg, runMarket(spark, cfg)))
    val summaries = results.map(_._2._1)
    import spark.implicits._
    val summaryDf = summaries.toDF()
    val failures = results.map { case (cfg, (_, rej)) =>
      rej.select(lit(cfg.marketId.toUpperCase).as("market"),
        col("key"), col("reason"))
    }.reduce(_.unionByName(_))
    (summaries, Report.renderReport(summaryDf, failures))
  }
}
