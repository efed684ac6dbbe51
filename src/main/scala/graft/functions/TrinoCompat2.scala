package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

/** Completes the reference's core scalar surface — the 30+ spellings
  * from `core/trino-main/.../operator/scalar/` that neither Spark's
  * builtin registry nor the earlier packs resolved (enumerated by
  * `tools.ProbeFns` against the reference's `@ScalarFunction` names).
  * Codegen-preserving expression aliases where a builtin exists under
  * another name; UDFs for genuinely new semantics.
  */
object TrinoCompat2 {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    val reg = spark.sessionState.functionRegistry
    def alias(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // --- lambda matchers (ArrayAllMatchFunction.java etc.) — alias onto
    // Spark's higher-order expressions so the lambda stays codegen'd ---
    alias("all_match", es => ArrayForAll(es(0), es(1)))
    alias("any_match", es => ArrayExists(es(0), es(1)))
    // the lambda's direct parent must be the higher-order function, so
    // none_match negates the lambda BODY inside a forall
    alias("none_match", es => es(1) match {
      case lf @ LambdaFunction(fn, _, _) => ArrayForAll(es(0), lf.copy(function = Not(fn)))
      case other => Not(ArrayExists(es(0), other))
    })

    // --- bitwise (BitwiseFunctions.java; Trino right-shift is LOGICAL,
    // the _arithmetic spelling is the sign-extending one) ---
    alias("bitwise_left_shift", es => ShiftLeft(es(0), es(1)))
    alias("bitwise_right_shift", es => ShiftRightUnsigned(es(0), es(1)))
    alias("bitwise_right_shift_arithmetic", es => ShiftRight(es(0), es(1)))

    // --- string / binary ---
    // codepoint(ch): Unicode code point of a 1-codepoint string
    u.register("codepoint", (s: String) =>
      if (s == null) null else Integer.valueOf(s.codePointAt(0)))
    alias("from_base64", es => UnBase64(es.head))
    alias("from_hex", es => Unhex(es.head))
    // IEEE-754 big-endian byte images (IEEE754Functions.java)
    u.register("to_ieee754_32", (v: Float) =>
      java.nio.ByteBuffer.allocate(4).putFloat(v).array())
    u.register("from_ieee754_32", (b: Array[Byte]) =>
      if (b == null) null
      else java.lang.Float.valueOf(java.nio.ByteBuffer.wrap(b).getFloat))
    u.register("to_ieee754_64", (v: Double) =>
      java.nio.ByteBuffer.allocate(8).putDouble(v).array())
    u.register("from_ieee754_64", (b: Array[Byte]) =>
      if (b == null) null
      else java.lang.Double.valueOf(java.nio.ByteBuffer.wrap(b).getDouble))
    // combine_hash (CombineHashFunction.java: h1 * 31 + h2)
    u.register("combine_hash", (a: Long, b: Long) => a * 31 + b)

    // --- math ---
    u.register("nan", () => Double.NaN)
    alias("is_nan", es => IsNaN(es.head))
    // truncate(x) rounds toward zero (MathFunctions.java:1099)
    u.register("truncate", (v: Double) =>
      if (v < 0) math.ceil(v) else math.floor(v))

    // --- date/time (DateTimeFunctions.java) ---
    // Trino's day_of_week is ISO: 1 = Monday … 7 = Sunday
    // (Spark WeekDay: 0 = Monday, so shift by one)
    alias("day_of_week", es => Add(WeekDay(es.head), Literal(1)))
    alias("day_of_year", es => DayOfYear(es.head))
    alias("week", es => WeekOfYear(es.head))
    alias("last_day_of_month", es => LastDay(es.head))
    u.register("year_of_week", (d: java.sql.Date) =>
      if (d == null) null
      else Integer.valueOf(d.toLocalDate.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR)))
    u.register("millisecond", (t: java.time.Instant) =>
      if (t == null) null else Integer.valueOf((t.getNano / 1000000) % 1000))
    u.register("from_iso8601_date", (s: String) =>
      if (s == null) null else java.sql.Date.valueOf(java.time.LocalDate.parse(s)))
    // nanos variants land on Spark's microsecond timestamps — sub-micro
    // precision truncates (documented type-fidelity corner)
    u.register("from_unixtime_nanos", (n: Long) =>
      java.time.Instant.ofEpochSecond(Math.floorDiv(n, 1000000000L),
        Math.floorMod(n, 1000000000L)))
    u.register("from_iso8601_timestamp_nanos", (s: String) =>
      if (s == null) null
      else java.time.OffsetDateTime.parse(s).toInstant)
    u.register("to_unixtime", (t: java.time.Instant) =>
      if (t == null) null
      else java.lang.Double.valueOf(t.getEpochSecond + t.getNano / 1e9))
    u.register("to_milliseconds", (d: java.time.Duration) =>
      if (d == null) null else java.lang.Long.valueOf(d.toMillis))
    // session-zone views of the tz family: the engine stores instants
    // (no `timestamp with time zone` type), so zone accessors evaluate
    // against the session zone and at/with_timezone produce the wall
    // clock / instant through an explicit zone (documented collapse)
    u.register("current_timezone", () =>
      java.time.ZoneId.systemDefault().getId)
    u.register("timezone_hour", (t: java.time.Instant) =>
      if (t == null) null
      else Integer.valueOf(java.time.ZoneId.systemDefault().getRules
        .getOffset(t).getTotalSeconds / 3600))
    u.register("timezone_minute", (t: java.time.Instant) =>
      if (t == null) null
      else Integer.valueOf((java.time.ZoneId.systemDefault().getRules
        .getOffset(t).getTotalSeconds / 60) % 60))
    u.register("at_timezone", (t: java.time.Instant, zone: String) =>
      if (t == null || zone == null) null
      else java.time.LocalDateTime.ofInstant(t, java.time.ZoneId.of(zone)))
    u.register("with_timezone", (t: java.time.LocalDateTime, zone: String) =>
      if (t == null || zone == null) null
      else t.atZone(java.time.ZoneId.of(zone)).toInstant)

    // --- map / array ---
    // multimap_from_entries(array(row(k, v))) → map(k, array(v));
    // string-typed here (the engine's generic-row UDF path has no
    // encoder for Any) — insertion order of first appearance preserved
    u.register("multimap_from_entries", (entries: Seq[(String, String)]) =>
      if (entries == null) null
      else {
        val m = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
        entries.filter(_ != null).foreach { case (k, v) =>
          m.update(k, m.getOrElse(k, Vector.empty) :+ v)
        }
        m.toMap
      })

    // features(x1, x2, ...) → map(index, double) — trino-ml's
    // FeatureVector literal (plugin/trino-ml FeatureFunctions.java);
    // variadic via an expression builder, codegen'd CreateMap
    alias("features", es => CreateMap(es.zipWithIndex.flatMap { case (e, i) =>
      Seq(Literal(i), Cast(e, org.apache.spark.sql.types.DoubleType))
    }))

    // --- misc ---
    u.register("fail", (msg: String) =>
      // Trino fail() raises USER_ERROR; unreachable value pins the type
      if (msg != new Object) throw new RuntimeException(msg) else "")
    u.register("current_groups", () => Seq.empty[String])
    // values_at_quantiles over the qdigest sketch-as-value
    u.register("values_at_quantiles", (sketch: Seq[Long], qs: Seq[Double]) =>
      if (sketch == null || qs == null) null
      else {
        val arr = sketch.toArray
        qs.map(q => QDigest.valueAtQuantile(arr, q))
      })
  }
}
