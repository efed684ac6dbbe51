package graft

import org.apache.spark.sql.functions._

/** Recall of the Manku rotate-and-prefix simhash blocking against the
  * EXHAUSTIVE truth at its design threshold, hamming ≤ 3 (feasible at
  * sf0.01: 500 docs → 125k brute pairs). The analytical recall at T=16
  * rotations, B=20 prefix bits is ≈ 1 − (1 − (44/64)³)¹⁶ ≈ 0.998; the
  * spec pins ≥ 0.95 so a blocking regression is caught. Context pinned
  * by measurement: the ≤ 8 threshold of `dedup_simhash` is NOT reachable
  * by linear blocking of a 64-bit fingerprint (0.49 recall at the same
  * T/B) — that threshold stays with the banded small-corpus plan.
  */
class SimhashMankuSpec extends GraftSuite {

  test("manku blocking recall >= 0.95 vs exhaustive hamming<=3 truth") {
    val dir = "/root/testdata/sf0.01"
    graft.functions.GraftFunctions.register(spark)
    val fp = graft.engine.Tables.load(spark, dir, "documents")
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("sh", expr("simhash64_native(norm)"))
      .select(col("doc_id"), col("sh"))
    val truth = fp.as("a").join(fp.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val manku = SparkEntry.queries("dedup_simhash_manku")(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain hamming<=3 near-dups")
    assert(manku.subsetOf(truth),
      "blocking must never emit a pair outside the verified truth")
    val recall = manku.size.toDouble / truth.size
    info(f"truth=${truth.size} manku recall=$recall%.3f")
    assert(recall >= 0.95, f"manku recall $recall%.3f under floor")
  }
}
