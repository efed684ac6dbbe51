package graft.functions

/** Deterministic, dependency-free hash/edit-distance kernels used by the
  * dedup and text-analysis operators. All pure row-local functions —
  * distribute with no coordination, no driver state.
  */
object Hashing {
  /** FNV-1a 64-bit over UTF-8 bytes — stable across JVMs and rounds. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** fnv64 with a seed mixed in — cheap family of hash functions for
    * minhash signatures (one seed per permutation).
    */
  def fnv64Seeded(s: String, seed: Long): Long =
    fnv64SeededBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Byte-level form: hash UTF-8 (or arbitrary binary) without a String
    * round-trip — identical output to [[fnv64Seeded]] on the same bytes.
    */
  def fnv64SeededBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    // final avalanche (splitmix64 tail) so seeds decorrelate
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** splitmix64 finalizer — avalanche for integral keys. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }
}

/** Minimal English suffix-stripping stemmer (Porter step-1-ish). The
  * reference exposes `word_stem` via a Snowball library
  * (`operator/scalar/WordStemFunction.java`); we only need deterministic,
  * reasonable behavior for text-pipeline grouping, not Snowball parity.
  */
object Stemmer {
  def stem(wRaw: String): String = {
    val w = wRaw.toLowerCase
    if (w.length <= 3) return w
    def repl(suffix: String, by: String): Option[String] =
      if (w.endsWith(suffix) && w.length - suffix.length + by.length > 2)
        Some(w.substring(0, w.length - suffix.length) + by)
      else None
    repl("sses", "ss").orElse(repl("ies", "i")).orElse(repl("ss", "ss"))
      .orElse(repl("ing", "")).orElse(repl("edly", "")).orElse(repl("ed", ""))
      .orElse(repl("ly", "")).orElse(repl("s", ""))
      .getOrElse(w)
  }
}
