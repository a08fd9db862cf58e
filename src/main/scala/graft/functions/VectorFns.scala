package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  * Arithmetic happens in DOUBLE with sequential fold order, so
  * results are deterministic and oracle-comparable after rounding.
  *
  * `dot` rides the native codegen'd [[DotProduct]] expression
  * (registered per session by [[GraftFunctions.register]]); `dotHof`
  * is the builtin higher-order-function formulation kept as a
  * reference/cross-check implementation.
  */
object VectorFns {

  def toDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms: identical arithmetic to
    * [[cosine]] — norm(x) = sqrt(dot(x, x)) evaluated once per VECTOR
    * (a projection column) instead of once per PAIR — so scores are
    * bit-identical and oracle hashes unchanged, but an all-pairs
    * scoring pass runs 1 dot product per pair instead of 3. At 100 TB
    * the pair side dwarfs the vector side by orders of magnitude. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
