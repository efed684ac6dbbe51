package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{DateFormatClass, Encode, Expression, Hex, Literal, StringDecode, StringInstr}
import org.apache.spark.sql.catalyst.expressions.aggregate.{BitAndAgg, BitOrAgg, First, HyperLogLogPlusPlus}
import org.apache.spark.sql.functions.udaf

/** Trino-spelled names for capabilities Spark exposes under different
  * spellings (or not at all): the JSON family
  * (`core/trino-main/.../operator/scalar/JsonFunctions.java`), hmac_*
  * (`HmacFunctions.java`), split_to_map/split_to_multimap
  * (`SplitToMapFunction.java`, `SplitToMultimapFunction.java`),
  * contains_sequence / ngrams / combinations (`ArrayFunctions`), and the
  * aggregate names approx_distinct / arbitrary / bitwise_and_agg /
  * bitwise_or_agg / map_union (`FunctionRegistry.java:379`).
  *
  * Pure-rename aliases (strpos, to_hex, format_datetime, approx_distinct,
  * arbitrary, bitwise_*_agg) are registered as catalyst expression
  * builders, not UDFs, so they stay inside whole-stage codegen exactly
  * like the builtin they alias.
  */
object TrinoAliases {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    val reg = spark.sessionState.functionRegistry

    def alias(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // --- codegen-preserving renames ---
    alias("strpos", es => StringInstr(es(0), es(1)))
    alias("index", es => StringInstr(es(0), es(1))) // teradata-compat
    alias("to_hex", es => Hex(es.head))
    alias("to_utf8", es => Encode(es.head, Literal("UTF-8")))
    alias("from_utf8", es => StringDecode(es.head, Literal("UTF-8")))
    alias("format_datetime", es => DateFormatClass(es(0), es(1)))
    alias("approx_distinct", es => HyperLogLogPlusPlus(es.head))
    alias("arbitrary", es => First(es.head, ignoreNulls = true))
    alias("bitwise_and_agg", es => BitAndAgg(es.head))
    alias("bitwise_or_agg", es => BitOrAgg(es.head))

    // --- JSON family (Trino names; Spark only ships get_json_object) ---
    u.register("json_extract_scalar", (j: String, p: String) => {
      val n = JsonKit.path(j, p)
      if (n == null || n.isContainerNode || n.isNull) null else n.asText()
    })
    u.register("json_extract", (j: String, p: String) => {
      val n = JsonKit.path(j, p)
      if (n == null) null else n.toString
    })
    u.register("json_parse", (j: String) => {
      val n = JsonKit.parse(j)
      if (n == null) throw new IllegalArgumentException(s"Invalid JSON: '$j'")
      n.toString
    })
    u.register("json_format", (j: String) => {
      val n = JsonKit.parse(j)
      if (n == null) null else n.toString
    })
    u.register("json_size", (j: String, p: String) => {
      val n = JsonKit.path(j, p)
      if (n == null) null
      else java.lang.Integer.valueOf(if (n.isContainerNode) n.size() else 0)
    })
    u.register("json_array_length", (j: String) => {
      val n = JsonKit.parse(j)
      if (n == null || !n.isArray) null else java.lang.Integer.valueOf(n.size())
    })
    u.register("json_array_contains", (j: String, v: String) => {
      val n = JsonKit.parse(j)
      if (n == null || !n.isArray) null
      else {
        var found = false
        val it = n.elements()
        while (!found && it.hasNext) {
          val e = it.next()
          if (!e.isContainerNode && e.asText() == v) found = true
        }
        java.lang.Boolean.valueOf(found)
      }
    })
    u.register("json_array_get", (j: String, idx: Long) => {
      val n = JsonKit.parse(j)
      if (n == null || !n.isArray) null
      else {
        val i = if (idx < 0) n.size() + idx else idx
        val e = n.get(i.toInt)
        if (e == null) null else if (e.isTextual) e.asText() else e.toString
      }
    })

    // --- split_to_map / split_to_multimap (same delimiter order as Trino:
    // entryDelimiter, keyValueDelimiter) ---
    u.register("split_to_map", (s: String, entryDelim: String, kvDelim: String) =>
      if (s == null) null
      else {
        val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
        s.split(java.util.regex.Pattern.quote(entryDelim), -1).foreach { e =>
          if (e.nonEmpty) {
            val kv = e.split(java.util.regex.Pattern.quote(kvDelim), 2)
            val k = kv(0); val v = if (kv.length > 1) kv(1) else null
            if (out.contains(k))
              throw new IllegalArgumentException(s"Duplicate keys ($k) are not allowed")
            out(k) = v
          }
        }
        out.toMap
      })
    u.register("split_to_multimap", (s: String, entryDelim: String, kvDelim: String) =>
      if (s == null) null
      else {
        val out = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
        s.split(java.util.regex.Pattern.quote(entryDelim), -1).foreach { e =>
          if (e.nonEmpty) {
            val kv = e.split(java.util.regex.Pattern.quote(kvDelim), 2)
            val k = kv(0); val v = if (kv.length > 1) kv(1) else null
            out(k) = out.getOrElse(k, Vector.empty) :+ v
          }
        }
        out.toMap
      })

    // --- hmac family (HmacFunctions.java; string in, lowercase hex out —
    // render with to_hex-style casing in SQL if byte parity is needed) ---
    def hmac(algo: String): (String, String) => String = (data, key) => {
      if (data == null || key == null) null
      else {
        val mac = javax.crypto.Mac.getInstance(algo)
        mac.init(new javax.crypto.spec.SecretKeySpec(
          key.getBytes(java.nio.charset.StandardCharsets.UTF_8), algo))
        mac.doFinal(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
      }
    }
    u.register("hmac_md5", hmac("HmacMD5"))
    u.register("hmac_sha1", hmac("HmacSHA1"))
    u.register("hmac_sha256", hmac("HmacSHA256"))
    u.register("hmac_sha512", hmac("HmacSHA512"))

    // --- array stragglers ---
    // contiguous-subsequence containment (ArrayContainsSequence)
    u.register("contains_sequence", (arr: Seq[String], seq: Seq[String]) =>
      if (arr == null || seq == null) null
      else if (seq.isEmpty) java.lang.Boolean.TRUE
      else java.lang.Boolean.valueOf(arr.indexOfSlice(seq) >= 0))
    // word-level n-grams (ArrayNgramsFunction)
    u.register("ngrams", (arr: Seq[String], n: Int) =>
      if (arr == null) null
      else if (n <= 0) throw new IllegalArgumentException("N must be positive")
      else if (arr.length <= n) Seq(arr)
      else arr.sliding(n).toSeq)
    // k-combinations in index order, capped like the reference (n ≤ 5).
    // Enumerate INDEX combinations — Seq.combinations dedups by value, but
    // the reference enumerates positions: ['a','a','b'] choose 2 → 3 rows.
    u.register("combinations", (arr: Seq[String], n: Int) =>
      if (arr == null) null
      else if (n < 0 || n > 5) throw new IllegalArgumentException("n must be in [0, 5]")
      else arr.indices.combinations(n).map(idx => idx.map(arr)).toSeq)

    // --- map_union (MapUnionAggregation; first value wins on key clash —
    // the reference picks an arbitrary one) ---
    u.register("map_union", udaf(new MapUnionAggregator))
  }
}

/** Minimal JSONPath subset ($.field, [idx], $["field"]) over jackson (on
  * Spark's own classpath) — enough for the reference's json_extract tests.
  */
object JsonKit {
  private val mapper = new ObjectMapper // thread-safe for readTree

  def parse(j: String): JsonNode =
    if (j == null) null
    else try mapper.readTree(j) catch { case _: Exception => null }

  def path(j: String, p: String): JsonNode = {
    if (j == null || p == null) return null
    var node = parse(j)
    if (node == null) return null
    if (!p.startsWith("$")) return null
    var i = 1
    while (i < p.length && node != null) {
      p.charAt(i) match {
        case '.' =>
          val end0 = p.indexWhere(c => c == '.' || c == '[', i + 1)
          val end = if (end0 < 0) p.length else end0
          node = node.get(p.substring(i + 1, end))
          i = end
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) return null
          val inner = p.substring(i + 1, end).trim
          node =
            if (inner.startsWith("\"") || inner.startsWith("'"))
              node.get(inner.substring(1, inner.length - 1))
            else try node.get(inner.toInt) catch { case _: Exception => null }
          i = end + 1
        case _ => return null
      }
    }
    node
  }
}

/** map_union aggregator: merge maps across rows, first value wins per key. */
class MapUnionAggregator extends org.apache.spark.sql.expressions.Aggregator[
    Map[String, String], Map[String, String], Map[String, String]] {
  def zero: Map[String, String] = Map.empty
  def reduce(b: Map[String, String], a: Map[String, String]): Map[String, String] =
    if (a == null) b else a ++ b // b (earlier) wins on clash
  def merge(a: Map[String, String], b: Map[String, String]): Map[String, String] = b ++ a
  def finish(r: Map[String, String]): Map[String, String] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Map[String, String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()
}
