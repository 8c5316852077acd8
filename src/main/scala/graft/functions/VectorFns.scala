package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY.md §2.9 x_sim_*): cosine from
  * zip_with + aggregate (built-ins, per SURVEY §2.7's dot-product recipe)
  * and deterministic random-hyperplane LSH whose planes derive from md5 —
  * reproducible in the DuckDB oracle, no Math.random anywhere.
  */
object VectorFns {

  /** float[] → double[] once at the edge, so all similarity math runs in
    * double on both engines (float accumulation would diverge from the
    * oracle's).
    */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic ±1 hyperplane components: sign j,d = parity of the
    * first hex nibble of md5("j,d"). The same formula is expressible in
    * DuckDB SQL, so the oracle rebuilds the identical plane matrix.
    * `offset` shifts the plane index space, yielding an INDEPENDENT plane
    * family per offset — the multi-table OR recall path of LSH (each table
    * t uses offset t*1024; offset 0 is byte-identical to the original
    * single-table family).
    */
  def planes(nPlanes: Int, dim: Int, offset: Int = 0): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map { d =>
        val digest = MessageDigest.getInstance("MD5")
          .digest(s"${j + offset},$d".getBytes(StandardCharsets.UTF_8))
        if (((digest(0) >> 4) & 0x1) == 0) 1.0 else -1.0
      }
    }

  /** LSH bucket id: one sign bit per hyperplane, concatenated "1011"-style.
    * Computed map-side per row; the ANN join is then a plain equi-join on
    * this column — within-bucket brute force instead of all-pairs.
    */
  def bucket(v: Column, planeMatrix: Seq[Seq[Double]]): Column =
    concat(planeMatrix.map { p =>
      when(dot(v, typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
}
