package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  *
  * Everything is built from codegen'd built-ins and higher-order array
  * functions — no Scala UDFs — so plans stay whole-stage-codegen friendly
  * and the exact semantics can be mirrored in any engine with md5 +
  * list lambdas (the DuckDB oracles do exactly that).
  */
object TextFunctions {

  /** Tokenize on single spaces (fixture texts are single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Stable 60-bit hash: low 15 hex chars of md5. Engine-portable (md5 is
    * specified byte-exact everywhere) unlike murmur/xxhash builtins which
    * differ per engine. */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c), 18, 15), 16, 10).cast("long")

  /** Hash folded into the 31-bit universe used by the minhash/simhash
    * permutation arithmetic (keeps a*x+b inside 63 bits). */
  def stableHash31(c: Column): Column = stableHash60(c) % 2147483647L

  /** Minhash permutation k (k = 0..K-1): h_k(x) = (a_k*x + b_k) mod p,
    * p = 2^31-1, parameters derived from k so the oracle needs no
    * side-channel constant table. */
  def minhashPerm(x31: Column, k: Column): Column = {
    val a = ((k * 2 + 1) * 12582917L) % 2147483647L
    val b = ((k + 1) * 2654435761L) % 2147483647L
    (a * x31 + b) % 2147483647L
  }
}
