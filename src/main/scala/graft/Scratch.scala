package graft

/** Scratch-space layout for everything the engine writes locally (sink
  * round-trip queries, dev benchmarks, the warehouse dir). One place to
  * configure instead of hardcoded absolute paths (ADVICE r5):
  * `SPARK_GRAFT_SCRATCH` overrides; the default keys off the process
  * working directory, which for sbt/driver runs is the repo root.
  */
object Scratch {
  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      s"${sys.props.getOrElse("user.dir", ".")}/target/tmp")

  def path(name: String): String = s"$root/$name"

  /** Collision-free tag for run-scoped paths and table names, derived from
    * the input path. The previous `math.abs(s.hashCode)` recipe had two
    * bugs (ADVICE r5): `abs(Int.MinValue)` is still negative, and 32-bit
    * hash collisions let two different sf dirs clobber each other's
    * tables/paths. 48 bits of md5 make a cross-run collision ~2⁻⁴⁸ and the
    * tag is stable across JVMs (String.hashCode is too, but md5 is also
    * printable-safe and unsigned by construction).
    */
  def tag(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
}
