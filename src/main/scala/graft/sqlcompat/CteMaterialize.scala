package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Single execution for multiply-referenced WITH definitions.
  *
  * The reference's planner evaluates a WITH query once per reference
  * class (`core/trino-main/.../sql/planner/RelationPlanner.java` — CTEs
  * are planned once and re-referenced). Spark's `InlineCTE` instead
  * inlines every DETERMINISTIC definition into each reference, so a CTE
  * referenced N times executes N times unless `ReusedExchange` happens to
  * cover identical physical subtrees — which it does not for the q95
  * shape, where the two references sit under differently-shaped semi
  * joins (r8 verdict, Missing #1: q95's lineitem self-join ran twice and
  * was the TPC-DS slice's heaviest 100× point).
  *
  * The rewrite: parse the top-level `WITH name AS (...)` list; any
  * definition referenced ≥2 times (by later definitions or the main
  * query) is evaluated as its own DataFrame, persisted MEMORY_AND_DISK
  * (tracked in [[graft.engine.CachedPlans]] so runners release it after
  * each action), and registered as a temp view (tracked in
  * [[graft.engine.TempArtifacts]]); its definition is dropped from the
  * SQL so every reference resolves to the one cached plan. Definitions
  * referenced once are retained inline — caching them would cost a
  * materialization barrier (no pipelining, no pushdown through the
  * cache) for zero reuse.
  *
  * The parser is deliberately strict: anything it does not recognize
  * (recursive CTEs, column alias lists, a non-WITH query) returns the
  * text unchanged and the plain SQL path runs — a parse miss can never
  * change semantics, only forfeit the reuse.
  */
object CteMaterialize {

  private[graft] final case class Cte(name: String, body: String)

  /** Parse `WITH a AS (...), b AS (...) <rest>` → (defs, rest). None if
    * the text is not a top-level WITH of exactly that shape.
    */
  private[graft] def parse(sql: String): Option[(Seq[Cte], String)] = {
    var i = 0
    def skipWs(): Unit = { while (i < sql.length && sql.charAt(i).isWhitespace) i += 1 }
    def word(w: String): Boolean = {
      skipWs()
      if (sql.regionMatches(true, i, w, 0, w.length) &&
        (i + w.length >= sql.length ||
          (!Character.isLetterOrDigit(sql.charAt(i + w.length)) &&
            sql.charAt(i + w.length) != '_'))) { i += w.length; true }
      else false
    }
    def ident(): Option[String] = {
      skipWs()
      val start = i
      if (i < sql.length && (Character.isLetter(sql.charAt(i)) || sql.charAt(i) == '_')) {
        while (i < sql.length &&
          (Character.isLetterOrDigit(sql.charAt(i)) || sql.charAt(i) == '_')) i += 1
        Some(sql.substring(start, i))
      } else None
    }
    // balanced-paren body scan, skipping single-quoted literals
    def parenBody(): Option[String] = {
      skipWs()
      if (i >= sql.length || sql.charAt(i) != '(') return None
      val start = i + 1
      var depth = 0; var inStr = false
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '('  => depth += 1
          case ')'  =>
            depth -= 1
            if (depth == 0) { val b = sql.substring(start, i); i += 1; return Some(b) }
          case _ => ()
        }
        i += 1
      }
      None
    }
    if (!word("WITH")) return None
    val defs = Vector.newBuilder[Cte]
    var more = true
    while (more) {
      val name = ident().getOrElse(return None)
      if (name.equalsIgnoreCase("RECURSIVE")) return None
      if (!word("AS")) return None
      val body = parenBody().getOrElse(return None)
      defs += Cte(name, body)
      skipWs()
      if (i < sql.length && sql.charAt(i) == ',') { i += 1 } else more = false
    }
    val rest = sql.substring(i).trim
    if (rest.isEmpty) None else Some((defs.result(), rest))
  }

  /** Word-boundary, case-insensitive reference count of `name` across the
    * given SQL fragments.
    */
  private[graft] def refCount(name: String, fragments: Seq[String]): Int = {
    val re = ("(?i)(?<![A-Za-z0-9_])" +
      java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])").r
    fragments.map(f => re.findAllMatchIn(f).size).sum
  }

  private def withPrefix(retained: Seq[Cte], tail: String): String =
    if (retained.isEmpty) tail
    else s"WITH ${retained.map(c => s"${c.name} AS (${c.body})").mkString(", ")} $tail"

  /** Run `sqlText` with multiply-referenced top-level CTEs evaluated
    * once. Falls back to [[graft.engine.Tables.sql]] verbatim when the
    * text is not a recognizable WITH query.
    */
  def sql(s: SparkSession, dir: String, sqlText: String): DataFrame =
    parse(sqlText) match {
      case None => graft.engine.Tables.sql(s, dir, sqlText)
      case Some((ctes, rest)) =>
        var retained = Vector.empty[Cte]
        ctes.zipWithIndex.foreach { case (cte, idx) =>
          val scope = ctes.drop(idx + 1).map(_.body) :+ rest
          if (refCount(cte.name, scope) >= 2) {
            // evaluate ONCE: earlier retained defs are prepended (the body
            // may reference them); earlier materialized defs resolve as
            // temp views
            val df = graft.engine.Tables
              .sql(s, dir, withPrefix(retained, cte.body))
              .persist(StorageLevel.MEMORY_AND_DISK)
            graft.engine.CachedPlans.track(df)
            df.createOrReplaceTempView(graft.engine.TempArtifacts.view(cte.name))
          } else retained :+= cte
        }
        graft.engine.Tables.sql(s, dir, withPrefix(retained, rest))
    }
}
