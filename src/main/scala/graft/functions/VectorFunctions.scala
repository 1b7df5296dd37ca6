package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `ARRAY<FLOAT>` embedding columns, built from
  * Spark's higher-order functions (`zip_with`/`aggregate`/`transform`) so
  * the expressions stay inside Catalyst (no UDF serialization, columns
  * prune/push down normally).
  *
  * All arithmetic is widened to double FIRST (`cast(array<double>)`) and
  * folded sequentially left-to-right — this matches the oracle's
  * `list_sum(list_transform(list_zip(a::DOUBLE[], b::DOUBLE[]), …))`
  * bit-for-bit on well-conditioned inputs.
  *
  * Reference behavior: similarity scoring in retrievers
  * (workers/executor/executors/retrievers/simple.py:33-41, top-k default
  * unstract/sdk1/src/unstract/sdk1/index.py:40-41).
  */
object VectorFunctions {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold sum of an array<double>. */
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    arraySum(zip_with(asD(a), asD(b), (x, y) => x * y))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    arraySum(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)))

  /** Manhattan (L1) distance. */
  def l1(a: Column, b: Column): Column =
    arraySum(zip_with(asD(a), asD(b), (x, y) => abs(x - y)))

  /** L2 norm. */
  def l2Norm(c: Column): Column = sqrt(dotProduct(c, c))

  /** Cosine similarity (full formula — do not assume normalized inputs;
    * the driver tables happen to be L2-normalized but user data isn't). */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
