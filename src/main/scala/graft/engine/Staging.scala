package graft.engine

/** Per-(process, query) scratch directories for gate queries that
  * materialize state (streaming sinks/checkpoints, layout rewrites).
  *
  * The root is FIXED per (process, query) and wiped at the start of each
  * run, so repeated Verify/Bench rounds leave at most one tree per query
  * behind — a fresh temp dir per execution would accumulate one forever
  * (hundreds of rounds in, that is a full disk). The PID scope keeps two
  * concurrent gate runs on the same machine (parallel CI jobs) from
  * wiping each other's LIVE state mid-run — a purely fixed path could;
  * dead processes' roots are garbage-collected by age instead (far above
  * any gate run's minutes-long lifetime), so the bounded-accumulation
  * property survives the scoping.
  */
object Staging {

  /** Recursive delete that never follows symlinks — `isDirectory`
    * FOLLOWS links, and recursing through a staged input link would
    * delete the shared testdata parquet itself.
    */
  def wipe(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(wipe))
    f.delete()
  }

  /** A freshly-wiped `<tmpdir>/<rootName>/<pid>/<qname>` directory;
    * stale sibling PIDs' roots are garbage-collected only when the
    * owning process is DEAD (ProcessHandle liveness — a legitimately
    * long run past the age bar keeps its live checkpoints) AND the root
    * is older than 6 h (so a dead PID's number being recycled by an
    * unrelated fresh process never triggers a premature wipe; the age
    * test alone decides for unparseable names).
    */
  def scratch(rootName: String, qname: String): java.io.File = {
    val gate = new java.io.File(System.getProperty("java.io.tmpdir"), rootName)
    val pid = ProcessHandle.current().pid()
    Option(gate.listFiles()).foreach(_.foreach { sib =>
      val aged =
        System.currentTimeMillis() - sib.lastModified() > 6L * 3600 * 1000
      val ownerAlive = sib.getName.toLongOption.exists { p =>
        val h = ProcessHandle.of(p)
        h.isPresent && h.get().isAlive
      }
      if (sib.getName != pid.toString && aged && !ownerAlive) wipe(sib)
    })
    val tmp = new java.io.File(new java.io.File(gate, pid.toString), qname)
    if (tmp.exists()) wipe(tmp)
    tmp.mkdirs()
    tmp.getParentFile.setLastModified(System.currentTimeMillis())
    tmp
  }
}
