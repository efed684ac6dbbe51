package graft.sqlcompat

/** Trino SQL dialect shims (SURVEY §4.3): text-level rewrites for grammar
  * Spark's parser rejects. Applied by `graft.engine.Tables.sql` before
  * parsing. Everything else in the Trino grammar that the workloads use
  * (lambdas `x -> f(x)`, `||`, INTERVAL literals, VALUES, GROUPING SETS,
  * quantified rewrites) parses natively.
  */
object Dialect {

  /** `... ORDER BY <keys> FETCH FIRST <n> ROWS WITH TIES` →
    * rank-filter rewrite — the same lowering the reference applies in
    * `sql/planner/iterative/rule/ImplementLimitWithTies.java`.
    */
  private val FetchWithTies =
    // greedy body so the rewrite anchors on the LAST ORDER BY — an ORDER BY
    // inside a window spec or subquery must stay with the body, only the
    // trailing top-level ORDER BY pairs with FETCH ... WITH TIES
    """(?is)^(.*)\bORDER\s+BY\s+(.+?)\s+FETCH\s+FIRST\s+(\d+)\s+ROWS?\s+WITH\s+TIES\s*$""".r

  /** `FETCH FIRST n ROWS ONLY` → LIMIT n (Spark parses LIMIT). */
  private val FetchOnly =
    """(?is)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY""".r

  def rewrite(sql: String): String = {
    val afterTies = sql match {
      case FetchWithTies(body, orderKeys, n) =>
        s"""SELECT * EXCEPT (__graft_rank) FROM (
           |  SELECT q.*, rank() OVER (ORDER BY $orderKeys) AS __graft_rank
           |  FROM ($body) q
           |) WHERE __graft_rank <= $n""".stripMargin
      case other => other
    }
    FetchOnly.replaceAllIn(afterTies, m => s"LIMIT ${m.group(1)}")
  }
}
