package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog bootstrap: the engine's data model is catalog tables over
  * columnar files (reference: connector-provided tables,
  * `core/trino-spi/src/main/java/io/trino/spi/connector/ConnectorMetadata.java`).
  * Here the catalog is a directory of parquet tables registered as temp
  * views; Spark's DataSource V2 handles split enumeration, predicate
  * pushdown and column pruning (reference rebuilds all of that by hand in
  * `TableScanOperator.java:50` + `lib/trino-parquet`).
  *
  * Scale note: at 100 TB these would be partitioned/bucketed external
  * tables; nothing here assumes the data fits anywhere — registration is
  * metadata-only (footer reads), all IO stays lazy and distributed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one table; metadata-only until an action runs.
    * `events.ts` has shipped as TIMESTAMP(NANOS) (which Spark's reader
    * rejects — read as raw nanos, truncate to micros, the same
    * truncation DuckDB applies) and as TIMESTAMP(MICROS, ntz) in
    * different fixture generations; `doLoad` dispatches on the actual
    * parquet schema and normalizes both to session-zoned microsecond
    * timestamps.
    */
  // Per-session caches. spark.read.parquet costs ~0.1 s of driver-side
  // schema inference per call even when warm; a query rebuilt per bench run
  // (or 138 Verify queries × 10 tables) pays it every time unless cached.
  // Round-2 driver bench showed exactly the register-per-run queries
  // "regressing" 4-6× — that was this catalog churn amplified by load, not
  // the operators. WeakHashMap so dead test sessions don't pin DataFrames.
  private val loadCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = synchronized {
    val perSession = {
      var m = loadCache.get(spark)
      if (m == null) { m = scala.collection.mutable.Map[String, DataFrame](); loadCache.put(spark, m) }
      m
    }
    perSession.getOrElseUpdate(s"$dir/$name", doLoad(spark, dir, name))
  }

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // `events.ts` has shipped as TIMESTAMP(NANOS) (unreadable except as
      // raw nanos) and as TIMESTAMP(MICROS, ntz) in different fixture
      // generations; accept either, normalizing to the engine's
      // session-zoned microsecond timestamps. The ntz→ltz cast is only
      // epoch-preserving under a UTC session tz — SessionDefaults pins
      // it, and it is re-pinned here so a session built WITHOUT
      // SessionDefaults cannot silently shift ts values (r6 advice).
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table of a scale-factor directory as a temp view.
    * Idempotent; cheap (no data read). Also installs the function pack so
    * SQL text can use the Trino-compat surface.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val already = synchronized {
      val prev = registeredDir.get(spark)
      registeredDir.put(spark, dir)
      prev == dir
    }
    if (!already) names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
  }

  /** Forget that `spark` has its views registered — the next [[sql]] or
    * [[register]] call re-registers them (metadata-only, cheap). Called by
    * [[TempArtifacts.cleanupAll]] after dropping tracked temp views, in
    * case one of them shadowed a base table name.
    */
  private[graft] def invalidateRegistration(spark: SparkSession): Unit =
    synchronized { registeredDir.remove(spark); () }

  /** Register views and run a SQL query against them — the engine's main
    * entry, mirroring the reference's sole public API (SQL text,
    * `sql/parser/SqlParser.java:45`), with Spark's parser + Catalyst in
    * place of trino-parser + its optimizer. Multiply-referenced WITH
    * definitions evaluate ONCE (the reference's per-definition planning,
    * `sql/planner/RelationPlanner.java`) — routed through
    * [[graft.sqlcompat.CteMaterialize]], which falls back to
    * [[sqlPlain]] for anything that is not a recognizable WITH query.
    */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    // session statements (SET SESSION / PREPARE / EXECUTE / DESCRIBE
    // OUTPUT) short-circuit before the query path
    graft.sqlcompat.Statements.dispatch(spark, q => sql(spark, dir, q), query).getOrElse {
      graft.sqlcompat.CteMaterialize.sql(spark, dir, query)
    }
  }

  /** The non-CTE-materializing query path: dialect shims + row-pattern
    * lowering + Spark SQL. Used by [[sql]] via CteMaterialize (which
    * needs a plain entry for CTE bodies and the main query to avoid
    * re-entering itself) and by tests that pin inline-vs-materialized
    * equivalence.
    */
  private[graft] def sqlPlain(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    // MATCH_RECOGNIZE clauses can't become Spark SQL text — they lower
    // to the row-pattern operator and re-enter the query as a temp view
    val afterMr = graft.sqlcompat.MatchRecognizeSql.rewrite(spark, query)
    val rewritten = graft.sqlcompat.Dialect.rewrite(afterMr)
    // Registration-coupling guard (r13 advice): plain corr windows stay
    // NATIVE since r13 (WindowFrames.lowersOnPlainWindow) and are only
    // ANSI-safe through the AnsiSafeCorr override that GraftExtensions
    // injects — in a vanilla session a degenerate frame (single pair,
    // zero variance) would throw ANSI DIVIDE_BY_ZERO at runtime. Fail
    // loudly at submit time instead of surfacing Spark's opaque error.
    corrWindowGuard(spark, rewritten)
    spark.sql(rewritten)
  }

  private val CorrWindowProbe = java.util.regex.Pattern.compile(
    "(?is)\\bcorr\\s*\\((?:(?!\\bover\\b).)*\\)\\s*over\\b")

  private[graft] def corrWindowGuard(spark: SparkSession, rewritten: String): Unit =
    // probe the literal-masked, comment-stripped text — a string literal
    // (or comment) containing "corr(x) over" must not trip the guard
    // (r14 advice)
    if (CorrWindowProbe.matcher(
          graft.sqlcompat.Dialect.probeText(rewritten)).find() &&
        !spark.sessionState.functionRegistry
          .lookupFunction(org.apache.spark.sql.catalyst.FunctionIdentifier("corr"))
          .exists(_.getClassName == "graft.functions"))
      throw new IllegalStateException(
        "corr window functions need the ANSI-safe corr override: build the " +
          "session with .withExtensions(new graft.engine.GraftExtensions) " +
          "(degenerate frames would otherwise throw ANSI DIVIDE_BY_ZERO)")
}
