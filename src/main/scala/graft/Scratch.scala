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

  /** Cheap content fingerprint of an input table path (a parquet file or
    * a directory of part files): md5 over the sorted (relative path,
    * length, mtime) triples of every LEAF file — filesystem metadata
    * only, no data scan. Folded into published-artifact roots (ADVICE
    * r14) so REGENERATING the corpus at the same path invalidates the
    * artifact instead of leaving a stale published copy that every new
    * session silently serves. Hardened per ADVICE r15: a nonexistent
    * path FAILS (a stable tag for missing input would pin an artifact
    * to garbage), an unlistable dir FAILS (silently fingerprinting
    * nothing is the same bug), and the walk is RECURSIVE so a
    * partitioned/nested table fingerprints its leaf files, not the
    * top-level subdir metadata (dir mtimes don't reliably change when a
    * leaf inside is rewritten in place). ADVICE r16: when the walk root
    * IS the file, relativize against it yields "" and the leaf NAME
    * dropped out of the descriptor — two single-file tables with equal
    * length+mtime fingerprinted identically; fall back to getName so
    * the name stays in (one more one-time artifact rebuild, as r16's
    * recursive-walk change was).
    */
  def fingerprint(path: String): String = {
    val root = new java.io.File(path)
    require(root.exists(), s"Scratch.fingerprint: input path does not exist: $path")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) {
        val kids = Option(f.listFiles()).getOrElse(
          throw new java.io.IOException(s"Scratch.fingerprint: cannot list $f"))
        kids.sortBy(_.getName).toIndexedSeq.flatMap(walk)
      } else Seq(f)
    val base = root.toPath
    val desc = walk(root)
      .map { x =>
        val rel = base.relativize(x.toPath).toString
        val name = if (rel.isEmpty) x.getName else rel
        s"$name:${x.length}:${x.lastModified}"
      }
      .mkString("\n")
    tag(desc)
  }

  private def deleteRecursively(dir: java.io.File): Unit = if (dir.exists()) {
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(dir.toPath)
    try stream.iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally stream.close()
  }

  /** Build-and-publish with first-writer-wins atomicity — the shared
    * lake-artifact protocol (generalized from the tokenizer's
    * publishTokenizerOnce, ADVICE r13/VERDICT r14 #1): build into a
    * PID-SCOPED staging dir (concurrent JVMs never contend on partial
    * files), stamp the completion marker, then rename(2) the staged dir
    * to the pid-free `root` — atomic on POSIX, and it FAILS if another
    * writer already published (non-empty target), in which case the
    * loser discards its staging and serves the winner's artifact, which
    * is equivalent by construction (same inputs, deterministic build).
    * Readers only ever observe a complete artifact: the marker is staged
    * before the rename makes anything visible at the published path —
    * this is what lets a NEW session/cluster serve by path instead of
    * rebuilding, the difference between a lake artifact and a
    * per-process cache.
    */
  def publishOnce(root: String, marker: String = "_built")(build: String => Unit): String = {
    if (new java.io.File(s"$root/$marker").exists()) return root
    // ADVICE r15 hardening, both about leaked staging dirs:
    // (1) OUR staging path may already exist — a crashed earlier process
    //     plus OS pid reuse — and Spark's overwrite only replaces the
    //     paths the current recipe writes, so stale strays would be
    //     PUBLISHED alongside the fresh build. Clear it first.
    // (2) Staging dirs of OTHER, now-dead pids have no owner left to
    //     clean them; sweep siblings whose pid no longer runs. Live pids
    //     are left alone — they are a concurrent writer mid-build.
    //     ADVICE r16 hardening: ProcessHandle.of only sees the LOCAL pid
    //     namespace — a writer in another container sharing this
    //     filesystem looks dead — so "dead" alone is not enough; the dir
    //     must ALSO be stale (mtime > 1h: far beyond any artifact build
    //     here, so a mid-build sibling is never younger-than-live). And
    //     a non-Long pid string (hand-made dir) must not throw out of
    //     publishOnce — parse under Try, skip on failure.
    val staging = s"${root}_stage_p${ProcessHandle.current().pid()}"
    deleteRecursively(new java.io.File(staging))
    val parent = new java.io.File(root).getParentFile
    val stagePat = s"${new java.io.File(root).getName}_stage_p(\\d+)".r
    val staleMs = 60L * 60 * 1000
    Option(parent).flatMap(p => Option(p.listFiles())).getOrElse(Array.empty)
      .foreach { f =>
        f.getName match {
          case stagePat(pid) =>
            val dead = scala.util.Try(pid.toLong).toOption.exists(p =>
              !ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
            val stale = System.currentTimeMillis() - f.lastModified() > staleMs
            if (dead && stale) deleteRecursively(f)
          case _ =>
        }
      }
    build(staging)
    new java.io.File(staging).mkdirs() // a no-file build still publishes
    new java.io.File(s"$staging/$marker").createNewFile()
    val from = java.nio.file.Paths.get(staging)
    val to = java.nio.file.Paths.get(root)
    java.nio.file.Files.createDirectories(to.getParent)
    try java.nio.file.Files.move(from, to, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException | _: java.nio.file.FileSystemException
          if new java.io.File(s"$root/$marker").exists() =>
        // lost the publish race — the winner's artifact is the one served
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val stream = Files.walk(from)
        try stream.iterator().asScala.toSeq.reverseIterator
          .foreach((p: Path) => Files.deleteIfExists(p))
        finally stream.close()
    }
    root
  }
}
