package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session/statement surface (reference grammar `SqlBase.g4:153-157`):
  * SET SESSION → Spark session conf, PREPARE/EXECUTE/DEALLOCATE over a
  * per-session statement registry with positional `?` parameters,
  * DESCRIBE OUTPUT from the analyzed schema. DESCRIBE <table> itself
  * needs no shim — Spark parses it natively over the registered views.
  *
  * Returns Some(result) when `sql` is a statement this layer owns; None
  * lets the caller fall through to the query path.
  */
object Statements {

  private val prepared =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()

  // SET SESSION overlay, per session — what SHOW SESSION lists
  private val sessionSets =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.LinkedHashMap[String, String]]()
  private def sessionProps(spark: SparkSession): scala.collection.mutable.LinkedHashMap[String, String] =
    sessionSets.synchronized {
      var m = sessionSets.get(spark)
      if (m == null) {
        m = scala.collection.mutable.LinkedHashMap[String, String]()
        sessionSets.put(spark, m)
      }
      m
    }

  private def store(spark: SparkSession): scala.collection.mutable.Map[String, String] =
    synchronized {
      var m = prepared.get(spark)
      if (m == null) { m = scala.collection.mutable.Map[String, String](); prepared.put(spark, m) }
      m
    }

  private val SetSession =
    """(?is)^\s*SET\s+SESSION\s+([A-Za-z_][\w.]*)\s*=\s*(.+?)\s*$""".r
  private val Prepare =
    """(?is)^\s*PREPARE\s+([A-Za-z_]\w*)\s+FROM\s+(.+)$""".r
  private val Execute =
    """(?is)^\s*EXECUTE\s+([A-Za-z_]\w*)(?:\s+USING\s+(.+))?\s*$""".r
  private val Deallocate =
    """(?is)^\s*DEALLOCATE\s+PREPARE\s+([A-Za-z_]\w*)\s*$""".r
  private val DescribeOutput =
    """(?is)^\s*DESCRIBE\s+OUTPUT\s+([A-Za-z_]\w*)\s*$""".r
  private val DescribeInput =
    """(?is)^\s*DESCRIBE\s+INPUT\s+([A-Za-z_]\w*)\s*$""".r
  private val StartTransaction =
    """(?is)^\s*(?:START\s+TRANSACTION|BEGIN)(?:\s+.*)?$""".r
  private val Commit = """(?is)^\s*COMMIT(?:\s+WORK)?\s*$""".r
  private val Rollback = """(?is)^\s*ROLLBACK(?:\s+WORK)?\s*$""".r
  private val ShowCatalogs = """(?is)^\s*SHOW\s+CATALOGS\s*$""".r
  private val ShowSession = """(?is)^\s*SHOW\s+SESSION\s*$""".r
  private val ExplainAnalyze = """(?is)^\s*EXPLAIN\s+ANALYZE\s+(.+)$""".r
  private val ExplainTyped =
    """(?is)^\s*EXPLAIN\s+\(\s*TYPE\s+(LOGICAL|DISTRIBUTED|VALIDATE|IO)\s*\)\s+(.+)$""".r
  private val ShowSchemas = """(?is)^\s*SHOW\s+SCHEMAS(?:\s+FROM\s+[\w.]+)?\s*$""".r
  private val ShowTables = """(?is)^\s*SHOW\s+TABLES(?:\s+LIKE\s+'([^']*)')?\s*$""".r
  private val ShowColumns = """(?is)^\s*SHOW\s+COLUMNS\s+FROM\s+([\w.]+)\s*$""".r
  private val ShowFunctions = """(?is)^\s*SHOW\s+FUNCTIONS\s*$""".r
  private val ShowStats = """(?is)^\s*SHOW\s+STATS\s+FOR\s+([\w.]+)\s*$""".r
  private val CreateTableAs =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+AS\s+(.+)$""".r
  private val InsertInto = """(?is)^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s+(.+)$""".r
  private val DropTable =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*$""".r
  private val DeleteFrom =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_]\w*)(?:\s+WHERE\s+(.+?))?\s*$""".r
  private val UpdateStmt =
    """(?is)^\s*UPDATE\s+([A-Za-z_]\w*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*$""".r
  private val MergeStmt =
    """(?is)^\s*MERGE\s+INTO\s+([A-Za-z_]\w*)\s+USING\s+\((.+?)\)\s+(?:AS\s+)?s\s+ON\s+(.+?)\s+(WHEN\s+.+?)\s*$""".r
  private val WhenClause =
    """(?is)WHEN\s+(MATCHED(?:\s+AND\s+.+?)?\s+THEN\s+(?:UPDATE\s+SET\s+.+?|DELETE)|NOT\s+MATCHED\s+THEN\s+INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\))(?=\s+WHEN\s|\s*$)""".r

  // managed-table storage, one directory per (session, table) — the
  // single-schema parquet analog of the reference's connector-managed
  // CTAS target (SqlBase.g4 createTableAsSelect / insertInto / dropTable)
  private val managed =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()
  private def managedTables(spark: SparkSession): scala.collection.mutable.Map[String, String] =
    managed.synchronized {
      var m = managed.get(spark)
      if (m == null) { m = scala.collection.mutable.Map[String, String](); managed.put(spark, m) }
      m
    }

  /** Strip one level of single quotes from a literal value. */
  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1).replace("''", "'")
    else v

  def dispatch(spark: SparkSession, runQuery: String => DataFrame, sql: String): Option[DataFrame] =
    sql match {
      case SetSession(key, value) =>
        import spark.implicits._
        spark.conf.set(key, unquote(value))
        sessionProps(spark).update(key, unquote(value))
        Some(Seq((key, unquote(value))).toDF("name", "value"))
      case Prepare(name, body) =>
        import spark.implicits._
        store(spark).put(name.toLowerCase, body.trim)
        Some(Seq(("PREPARE", name)).toDF("result", "statement"))
      case Deallocate(name) =>
        import spark.implicits._
        store(spark).remove(name.toLowerCase)
        Some(Seq(("DEALLOCATE", name)).toDF("result", "statement"))
      case Execute(name, args) =>
        val body = store(spark).getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"prepared statement not found: $name"))
        val params = Option(args).map(splitTopLevel).getOrElse(Seq.empty)
        Some(runQuery(substitute(body, params)))
      case DescribeOutput(name) =>
        import spark.implicits._
        val body = store(spark).getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"prepared statement not found: $name"))
        // parameters make the body unanalyzable; describe with NULLs bound
        val analyzed = runQuery(substitute(body,
          Seq.fill(countParams(body))("NULL")))
        Some(analyzed.schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString)).toDF("column_name", "type"))
      case DescribeInput(name) =>
        import spark.implicits._
        val body = store(spark).getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"prepared statement not found: $name"))
        // the analyzed NULL-bound plan exposes every relation's attributes;
        // a parameter adjacent to `col <op> ?` takes col's type, otherwise
        // 'unknown' (the reference reports unknown for non-inferable
        // positions too — SqlBase.g4:156 DESCRIBE INPUT)
        val analyzed = runQuery(substitute(body, Seq.fill(countParams(body))("NULL")))
        val attrTypes: Map[String, String] =
          analyzed.queryExecution.analyzed.collect { case p => p.output }
            .flatten.map(a => a.name.toLowerCase -> a.dataType.simpleString).toMap
        Some(paramContexts(body).zipWithIndex
          .map { case (ident, i) =>
            (i, ident.flatMap(id => attrTypes.get(id.toLowerCase)).getOrElse("unknown"))
          }.toDF("position", "type"))
      case StartTransaction() =>
        import spark.implicits._
        // parquet tables: statements are individually atomic (staged file
        // swaps); transaction scoping is acknowledged as a no-op like the
        // reference's auto-commit connectors
        Some(Seq("START TRANSACTION").toDF("result"))
      case Commit() =>
        import spark.implicits._
        Some(Seq("COMMIT").toDF("result"))
      case Rollback() =>
        import spark.implicits._
        Some(Seq("ROLLBACK").toDF("result"))
      case ExplainTyped(kind, body) =>
        import spark.implicits._
        // the reference's EXPLAIN (TYPE ...) grammar (SqlBase.g4): LOGICAL
        // = the optimized plan, DISTRIBUTED = the physical plan with its
        // exchanges, VALIDATE = analyze only, IO = the tables/files read
        val df = runQuery(body)
        kind.toUpperCase match {
          case "LOGICAL" =>
            Some(Seq(df.queryExecution.optimizedPlan.toString).toDF("Query Plan"))
          case "DISTRIBUTED" =>
            Some(Seq(df.queryExecution.executedPlan.toString).toDF("Query Plan"))
          case "VALIDATE" =>
            df.queryExecution.assertAnalyzed()
            Some(Seq(true).toDF("valid"))
          case _ => // IO — from the optimized logical plan (pre-AQE)
            import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
            val paths = df.queryExecution.optimizedPlan.collect {
              case l: LogicalRelation => l.relation match {
                case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
                case _ => Nil
              }
            }.flatten.distinct.sorted
            Some(paths.toDF("input"))
        }
      case ExplainAnalyze(body) =>
        import spark.implicits._
        // the reference's ExplainAnalyzeOperator (ExplainAnalyzeOperator
        // .java:34) RUNS the query and reports the plan annotated with
        // per-operator runtime stats; here: execute, unwrap the AQE-final
        // physical plan, one row per operator. `output_rows` is the
        // deterministic metric (drives the driver row); `metrics` renders
        // the full runtime metric map (timings/sizes, nondeterministic).
        val df = runQuery(body)
        df.collect() // populate runtime metrics
        import org.apache.spark.sql.execution._
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
        def walk(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case w: WholeStageCodegenExec => walk(w.child)
          case i: InputAdapter => walk(i.child)
          case r: ReusedExchangeExec => walk(r.child)
          case other => other +: other.children.flatMap(walk)
        }
        val rows = walk(df.queryExecution.executedPlan).zipWithIndex.map { case (p, i) =>
          val rowsOut: Option[Long] = p.metrics.get("numOutputRows").map(_.value)
          val rendered = p.metrics.toSeq.sortBy(_._1)
            .map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
          (i, p.nodeName.split(' ').head, rowsOut, rendered)
        }
        Some(rows.toDF("step", "operator", "output_rows", "metrics"))
      case ShowCatalogs() =>
        import spark.implicits._
        // one catalog in this engine, like a single-connector deployment
        Some(spark.catalog.listCatalogs().select("name").as[String].collect().toSeq
          .toDF("Catalog"))
      case CreateTableAs(ifNotExists, name, body) =>
        import spark.implicits._
        val key = name.toLowerCase
        // IF NOT EXISTS on an existing managed table is a no-op (the
        // clause's contract) — NOT an overwrite of its data
        if (ifNotExists != null && managedTables(spark).contains(key)) {
          Some(Seq(0L).toDF("rows"))
        } else {
          val path = managedTables(spark).getOrElseUpdate(key,
            java.nio.file.Files.createTempDirectory(s"graft-tbl-$key").toString + "/t")
          val obs = org.apache.spark.sql.Observation()
          runQuery(body)
            .observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("written"))
            .write.mode("overwrite").parquet(path)
          spark.read.parquet(path).createOrReplaceTempView(name)
          val n = Option(obs.get("written")).map(_.asInstanceOf[Long]).getOrElse(0L)
          Some(Seq(n).toDF("rows"))
        }
      case InsertInto(name, body) =>
        import spark.implicits._
        val path = managedTables(spark).getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"not a managed table: $name"))
        // appended-row count observed INSIDE the staged write (the
        // Dml Observation pattern) — a post-hoc rows.count() would
        // re-run the source, wrong for nondeterministic or
        // self-referencing queries
        val obs = org.apache.spark.sql.Observation()
        val rows = runQuery(body)
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("inserted"))
        // append through a staged union + swap: an in-place append that
        // dies mid-write would leave a torn table
        val staging = s"$path.__staging"
        spark.read.parquet(path).unionByName(rows, allowMissingColumns = false)
          .write.mode("overwrite").parquet(staging)
        graft.engine.Fs.swapIn(spark, path, staging)
        spark.read.parquet(path).createOrReplaceTempView(name)
        val n = Option(obs.get("inserted")).map(_.asInstanceOf[Long]).getOrElse(0L)
        Some(Seq(n).toDF("rows"))
      case DeleteFrom(name, where) =>
        import spark.implicits._
        val path = managedPath(spark, name)
        val n = graft.engine.Dml.delete(spark, path, Option(where).getOrElse("true"))
        spark.read.parquet(path).createOrReplaceTempView(name)
        Some(Seq(n).toDF("rows"))
      case UpdateStmt(name, setClause, where) =>
        import spark.implicits._
        val path = managedPath(spark, name)
        val n = graft.engine.Dml.update(spark, path,
          Option(where).getOrElse("true"), parseAssignments(setClause))
        spark.read.parquet(path).createOrReplaceTempView(name)
        Some(Seq(n).toDF("rows"))
      case MergeStmt(name, sourceSql, onCond, whenTail) =>
        import spark.implicits._
        val path = managedPath(spark, name)
        val MatchedRe =
          """(?is)^MATCHED\s*(?:AND\s+(.+?))?\s*THEN\s+(?:UPDATE\s+SET\s+(.+)|(DELETE))\s*$""".r
        val InsertRe =
          """(?is)^NOT\s+MATCHED\s+THEN\s+INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)\s*$""".r
        var insert: Option[Map[String, String]] = None
        val matchedBranches = Seq.newBuilder[graft.engine.Dml.WhenMatched]
        val clauses = WhenClause.findAllMatchIn(whenTail).map(_.group(1)).toList
        require(clauses.nonEmpty, s"MERGE: no WHEN clause parsed in: $whenTail")
        clauses.foreach {
          case MatchedRe(cond, set, del) =>
            matchedBranches += graft.engine.Dml.WhenMatched(Option(cond),
              if (del != null) None else Some(parseAssignments(set)))
          case InsertRe(cols, vals) =>
            insert = Some(splitTopLevel(cols).zip(splitTopLevel(vals)).toMap)
          case other =>
            throw new IllegalArgumentException(s"MERGE: unsupported clause: $other")
        }
        val (u, d, i) = graft.engine.Dml.merge(spark, path, runQuery(sourceSql),
          onCond, matchedBranches.result(), insert)
        spark.read.parquet(path).createOrReplaceTempView(name)
        Some(Seq((u, d, i)).toDF("updated", "deleted", "inserted"))
      case DropTable(name) =>
        import spark.implicits._
        managedTables(spark).remove(name.toLowerCase).foreach { path =>
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
        spark.catalog.dropTempView(name)
        Some(Seq(("DROP TABLE", name)).toDF("result", "statement"))
      case ShowSchemas() =>
        import spark.implicits._
        // the parquet catalog is single-schema, like the reference's
        // information_schema + one data schema per connector
        Some((spark.catalog.listDatabases().collect().map(_.name).toSeq :+
          "information_schema").distinct.sorted.toDF("Schema"))
      case ShowTables(like) =>
        import spark.implicits._
        val pat = Option(like).map(_.replace("%", ".*").replace("_", "."))
        val names = spark.catalog.listTables().collect().map(_.name)
          .filter(n => pat.forall(p => n.toLowerCase.matches(p.toLowerCase)))
        Some(names.sorted.toSeq.toDF("Table"))
      case ShowColumns(table) =>
        import spark.implicits._
        // Trino's SHOW COLUMNS shape (Column, Type, Extra, Comment)
        val schema = runQuery(s"SELECT * FROM $table LIMIT 0").schema
        Some(schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString, "", ""))
          .toDF("Column", "Type", "Extra", "Comment"))
      case ShowFunctions() =>
        import spark.implicits._
        Some(spark.catalog.listFunctions().collect().map(_.name)
          .distinct.sorted.toSeq.toDF("Function"))
      case ShowStats(table) =>
        import spark.implicits._
        // reference ShowStatsRewrite shape: one row per column
        // (ndv, nulls fraction, low/high) + a summary row carrying
        // row_count. Stats are COMPUTED exactly in one aggregate pass —
        // data_size is omitted (format-dependent in the reference too)
        import org.apache.spark.sql.functions._
        val df = runQuery(s"SELECT * FROM $table")
        val cols = df.columns.toSeq
        val aggs = count(lit(1L)).as("__n") +: cols.flatMap { c =>
          Seq(count_distinct(col(c)).as(s"__ndv_$c"),
            avg(when(col(c).isNull, 1.0).otherwise(0.0)).as(s"__nf_$c"),
            min(col(c)).cast("string").as(s"__lo_$c"),
            max(col(c)).cast("string").as(s"__hi_$c"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = r.getAs[Long]("__n")
        val rows = cols.map { c =>
          (c, Option(r.getAs[Long](s"__ndv_$c")),
            Option(r.getAs[Double](s"__nf_$c")), Option.empty[Long],
            Option(r.getAs[String](s"__lo_$c")), Option(r.getAs[String](s"__hi_$c")))
        } :+ ((null: String), Option.empty[Long], Option.empty[Double],
          Some(n), Option.empty[String], Option.empty[String])
        Some(rows.toDF("column_name", "distinct_values_count",
          "nulls_fraction", "row_count", "low_value", "high_value"))
      case ShowSession() =>
        import spark.implicits._
        // the SET SESSION overlay this layer manages, name/value/default
        // (reference: ShowSessionTask lists session properties)
        Some(sessionProps(spark).toSeq.sortBy(_._1)
          .map { case (k, v) => (k, v, "") }.toDF("Name", "Value", "Default"))
      case _ => None
    }

  /** For each positional `?` (outside literals, left to right): the
    * identifier on the other side of an adjacent comparison/arithmetic
    * operator (`col < ?`, `? = col`, `col LIKE ?`, `col IN (?`), if any.
    */
  private def paramContexts(body: String): Seq[Option[String]] = {
    val masked = body.toCharArray
    var i = 0; var inStr = false
    while (i < masked.length) { // blank out literals so idents inside don't match
      val c = masked(i)
      if (inStr) { if (c == '\'') inStr = false; masked(i) = ' ' }
      else if (c == '\'') { inStr = true; masked(i) = ' ' }
      i += 1
    }
    val s = new String(masked)
    val ident = """[A-Za-z_][\w.]*"""
    val op = """(?:<=|>=|<>|!=|=|<|>|\+|-|\*|/|(?i:LIKE)|(?i:IN)\s*\()"""
    val before = s"($ident)\\s*$op\\s*$$".r
    val after = s"^\\s*$op\\s*($ident)".r
    (0 until s.length).filter(s.charAt(_) == '?').map { pos =>
      val pre = s.substring(0, pos)
      val post = s.substring(pos + 1)
      before.findFirstMatchIn(pre).map(m => stripQual(m.group(1)))
        .orElse(after.findFirstMatchIn(post).map(m => stripQual(m.group(1))))
        .filterNot(id => Set("and", "or", "not", "like", "in").contains(id.toLowerCase))
    }
  }

  private def stripQual(ident: String): String =
    ident.substring(ident.lastIndexOf('.') + 1)

  /** Positional `?` substitution outside string literals. */
  private def substitute(body: String, params: Seq[String]): String = {
    val sb = new StringBuilder
    var i = 0; var inStr = false; var p = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false }
      else if (c == '\'') { sb.append(c); inStr = true }
      else if (c == '?') {
        require(p < params.length, s"not enough parameters for: $body")
        sb.append(params(p)); p += 1
      } else sb.append(c)
      i += 1
    }
    require(p == params.length, s"too many parameters: expected $p, got ${params.length}")
    sb.toString
  }

  private def countParams(body: String): Int = {
    var i = 0; var inStr = false; var n = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '?') n += 1
      i += 1
    }
    n
  }

  private def managedPath(spark: SparkSession, name: String): String =
    managedTables(spark).getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"not a managed table: $name"))

  /** `a = expr, b = expr` → Map, splitting each assignment on its FIRST
    * top-level `=` (the left side is always a bare column name).
    */
  private def parseAssignments(setClause: String): Map[String, String] =
    splitTopLevel(setClause).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad assignment: $a")
      a.substring(0, i).trim -> a.substring(i + 1).trim
    }.toMap

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
