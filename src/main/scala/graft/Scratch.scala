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

  /** The build-once-per-process marker idiom shared by every
    * persisted-artifact query (ANN indexes q148/q151, dedup indexes
    * q67/q175): run `build` only if `root/marker` is absent, then create
    * the marker. The single-writer contract lives here, once: roots are
    * pid-scoped so concurrent JVMs never contend, and a fresh process
    * always rebuilds. The marker is created strictly AFTER `build`
    * completes — a crash mid-build leaves no marker, and the rerun's
    * `mode("overwrite")` writes replace any partial files.
    */
  def buildOnce(root: String, marker: String = "_built")(build: => Unit): String = {
    val m = new java.io.File(s"$root/$marker")
    if (!m.exists()) {
      build
      m.getParentFile.mkdirs()
      m.createNewFile()
    }
    root
  }
}
