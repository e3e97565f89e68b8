package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 31-bit integer hashing: an affine chain per key plus
  * xorshift-multiply scramble rounds, with every intermediate < 2^62 so the
  * SAME arithmetic is exactly reproducible in any engine with 64-bit
  * integers. This is what lets the seeded-RNG (r1–r5), fingerprint and
  * simhash queries carry DuckDB oracles instead of rows-only checks —
  * xxhash64 exists only inside Spark.
  *
  * Each Column builder has a `...Sql` twin emitting the identical DuckDB
  * expression (BIGINT-cast, `xor`/`>>` — both engines shift arithmetically
  * and all values stay non-negative).
  */
object IntHash {

  /** Modulus/multiplier (classic glibc LCG) + scramble constants
    * (lowbias32-style xorshift-multiply). */
  val M: Long = 1L << 31
  val A: Long = 1103515245L
  val B: Long = 12345L
  val C1: Long = 0x45d9f3bL
  val C2: Long = 0x119de1f3L

  /** Affine chain: h ← (A·h + B + (key mod M)) mod M per key. */
  def chain(init: Column, keys: Seq[Column]): Column =
    keys.foldLeft(init)((h, k) =>
      pmod(lit(A) * h + lit(B) + pmod(k.cast("long"), lit(M)), lit(M)))

  /** Two xorshift-multiply rounds — an affine-only finish would leave
    * consecutive keys with near-identical outputs. Range [0, M). */
  def scramble(h: Column): Column = {
    val s1 = pmod(h.bitwiseXOR(shiftright(h, 16)) * lit(C1), lit(M))
    val s2 = pmod(s1.bitwiseXOR(shiftright(s1, 11)) * lit(C2), lit(M))
    s2.bitwiseXOR(shiftright(s2, 14))
  }

  /** Keyed mix: chain the keys from `seed mod M`, then scramble. */
  def mix(seed: Column, keys: Seq[Column]): Column =
    scramble(chain(pmod(seed.cast("long"), lit(M)), keys))

  /** Scalar twin of [[scramble]] for native expressions / driver code. */
  def scrambleLong(h: Long): Long = {
    val s1 = ((h ^ (h >> 16)) * C1) % M
    val s2 = ((s1 ^ (s1 >> 11)) * C2) % M
    s2 ^ (s2 >> 14)
  }

  /** 31-bit string hash: affine chain over the Unicode code points,
    * scrambled — the native StringHash31 expression (one tight loop; the
    * HOF fold over `split(s, "")` walks the interpreted lambda evaluator
    * once per character, bit-identical but far slower). */
  def stringHash(s: Column): Column =
    org.apache.spark.sql.graft.MinHashShim.stringHash31Col(s)

  // ---- DuckDB twins (same arithmetic, textual expressions) ----

  def chainSql(init: String, keys: Seq[String]): String =
    keys.foldLeft(init)((h, k) =>
      s"((CAST($A AS BIGINT) * $h + $B + (CAST($k AS BIGINT) % $M)) % $M)")

  def scrambleSql(h: String): String = {
    val s1 = s"((xor($h, $h >> 16) * $C1) % $M)"
    val s2 = s"((xor($s1, $s1 >> 11) * $C2) % $M)"
    s"xor($s2, $s2 >> 14)"
  }

  def mixSql(seed: String, keys: Seq[String]): String =
    scrambleSql(chainSql(s"(CAST($seed AS BIGINT) % $M)", keys))

  /** DuckDB twin of [[stringHash]]: fold the codepoints with a prepended 0
    * (list_reduce has no init; 0 as first element reproduces the fold). */
  def stringHashSql(s: String): String = {
    val cps = s"list_transform(range(1, length($s) + 1), i -> CAST(unicode($s[i]) AS BIGINT))"
    scrambleSql(
      s"list_reduce(list_concat([CAST(0 AS BIGINT)], $cps), " +
        s"(h, cp) -> (CAST($A AS BIGINT) * h + $B + cp) % $M)")
  }
}
