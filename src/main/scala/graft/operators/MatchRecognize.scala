package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** Row-pattern matching — a working subset of SQL MATCH_RECOGNIZE, the
  * reference's biggest capability Spark lacks (grammar `SqlBase.g4:331`,
  * NFA matcher `operator/window/matcher/Matcher.java`, plan node
  * `sql/planner/plan/PatternRecognitionNode.java:51`; SURVEY §2.5/§7).
  *
  * Supported subset:
  *   - PARTITION BY / ORDER BY
  *   - PATTERN: concatenation of symbols with greedy `?`/`+`/`*`
  *     quantifiers (no alternation, no nested groups)
  *   - DEFINE: row-local predicates (no PREV/NEXT navigation)
  *   - ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW
  *
  * Execution model: `groupByKey(partition key)` + `flatMapGroups` — the
  * idiomatic Spark shape for per-group sequential logic. One hash
  * exchange on the partition key; the matcher runs data-local per group
  * with backtracking over the sorted group buffer. State is bounded by
  * group size (per-user event counts), never by table size, so the
  * operator scales with the number of groups across executors.
  */
object MatchRecognize extends Serializable {

  sealed trait Quant
  case object One extends Quant
  case object Opt extends Quant
  case object Plus extends Quant
  case object Star extends Quant

  /** One pattern element: symbol name + quantifier. */
  case class Step(symbol: String, quant: Quant = One)

  /** A completed match handed to the measures function. */
  case class Match(matchNumber: Int, rows: IndexedSeq[Row], classifier: IndexedSeq[String]) {
    def rowsOf(symbol: String): IndexedSeq[Row] =
      rows.indices.collect { case i if classifier(i) == symbol => rows(i) }
  }

  /** ONE ROW PER MATCH over `df`.
    *
    * @param partitionKey  extracts the PARTITION BY key (grouping column)
    * @param orderKey      total order within a partition
    * @param pattern       concatenation of quantified symbols
    * @param define        symbol → row predicate (undefined symbols match always)
    * @param measures      builds the output row values for a match
    * @param outSchema     schema of the produced rows
    */
  def oneRowPerMatch(
      df: DataFrame,
      partitionKey: Row => Long,
      orderKey: Row => (Long, Long),
      pattern: Seq[Step],
      define: Map[String, Row => Boolean],
      measures: (Long, Match) => Row,
      outSchema: StructType): DataFrame = {

    val steps = pattern.toIndexedSeq
    df.groupByKey(partitionKey)(Encoders.scalaLong)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val rows = it.toIndexedSeq.sortBy(orderKey)
        val out = Seq.newBuilder[Row]
        var start = 0
        var matchNum = 0

        def pred(sym: String, r: Row): Boolean = define.get(sym).forall(_(r))

        // Greedy backtracking: returns classifier tags for the longest
        // match anchored at `from`, or null.
        def tryMatch(from: Int): IndexedSeq[String] = {
          val tags = Array.newBuilder[String]
          def go(pos: Int, step: Int, acc: List[String]): List[String] = {
            if (step == steps.length) return acc
            val Step(sym, quant) = steps(step)
            def matches(p: Int) = p < rows.length && pred(sym, rows(p))
            quant match {
              case One =>
                if (matches(pos)) go(pos + 1, step + 1, sym :: acc) else null
              case Opt =>
                if (matches(pos)) {
                  val r = go(pos + 1, step + 1, sym :: acc)
                  if (r != null) r else go(pos, step + 1, acc)
                } else go(pos, step + 1, acc)
              case Plus | Star =>
                var n = 0
                while (matches(pos + n)) n += 1
                val minN = if (quant == Plus) 1 else 0
                var k = n
                while (k >= minN) { // greedy, backtrack on failure
                  val r = go(pos + k, step + 1,
                    List.fill(k)(sym) reverse_::: acc)
                  if (r != null) return r
                  k -= 1
                }
                null
            }
          }
          val res = go(from, 0, Nil)
          if (res == null) null else res.reverse.toIndexedSeq
        }

        while (start < rows.length) {
          val tags = tryMatch(start)
          if (tags != null && tags.nonEmpty) {
            matchNum += 1
            out += measures(key,
              Match(matchNum, rows.slice(start, start + tags.length), tags))
            start += tags.length // AFTER MATCH SKIP PAST LAST ROW
          } else {
            start += 1
          }
        }
        out.result().iterator
      }(Encoders.row(outSchema))
  }
}
