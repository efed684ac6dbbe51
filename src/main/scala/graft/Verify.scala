package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // True when the oracle SQL has an ORDER BY outside any parens /
  // string literal — i.e. the query declares its own total row order.
  // Scans comment-stripped, literal-masked text (r14 advice: the words
  // 'order by' in a comment or quoted identifier must not suppress the
  // normalizing sort), with double-quoted identifiers skipped below.
  private[graft] def hasTopLevelOrderBy(sql: String): Boolean = {
    val s = graft.sqlcompat.Dialect.probeText(sql).toLowerCase
    var depth = 0; var i = 0; var inStr = false; var inIdent = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inIdent) { if (c == '"') inIdent = false }
      else if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '"'  => inIdent = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case 'o' if depth == 0 && s.regionMatches(i, "order", 0, 5) &&
          (i == 0 || (!Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_')) && {
            val rest = s.substring(i + 5)
            rest.headOption.exists(_.isWhitespace) && {
              val afterWs = rest.dropWhile(_.isWhitespace)
              afterWs.startsWith("by") &&
                afterWs.drop(2).headOption.forall(ch => !Character.isLetterOrDigit(ch) && ch != '_')
            }
          } => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names for a targeted dev run
    // (the driver always passes exactly two args → full dump)
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1))).foreach { case (name, fn) =>
      try {
        val df0 = fn(spark, sfDir)
        // Determinism boundary (r13 verdict #1): an oracle-declared query
        // with no top-level ORDER BY has no defined row order on EITHER
        // side, so normalize the dump to a total order (sort by every
        // column) before the single-file write — no downstream hash can
        // then be order-sensitive. Oracle-declared outputs are scalar-only
        // (the compare rejects nested/binary), so sorting is always legal.
        val df = SparkEntry.oracleSql.get(name) match {
          case Some(sql) if !hasTopLevelOrderBy(sql) =>
            df0.sort(df0.columns.map(org.apache.spark.sql.functions.col): _*)
          case _ => df0
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop any plan the query body persisted (e.g. pagerank's edge
      // list) so the shared session doesn't accumulate cache entries,
      // and delete the round-trip rows' temp dirs + `graft_*` temp views
      // (r8 verdict #3: Verify left the box dirtier each run)
      finally {
        graft.engine.CachedPlans.releaseAll()
        graft.engine.TempArtifacts.cleanupAll(spark)
      }
    }
    // end-of-session: also drop the persisted `graft_idx_*` store tables
    graft.engine.TempArtifacts.cleanupAll(spark, dropTables = true)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
