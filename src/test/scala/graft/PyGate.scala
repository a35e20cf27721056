package graft

import java.io.File
import java.util.concurrent.TimeUnit

/** Shared runner for the python selftest gates (RoundCloseSpec,
  * AnchorSweepToolSpec). Hardens the original inline pattern per the
  * round-16 ADVICE:
  *   - the script path resolves against the repo root (found by walking
  *     up from the working directory to the dir holding build.sbt), and
  *     a missing script FAILS the gate instead of assume()-skipping it —
  *     a silently skipped evidence-chain gate is a hole, not a pass;
  *   - the child's output is drained on a separate thread so a full
  *     pipe buffer cannot deadlock, and waitFor carries a generous
  *     timeout so a hung python3 cannot stall the whole sbt test run
  *     indefinitely (the process is destroyed forcibly on expiry).
  */
object PyGate {

  /** Walk up from cwd to the directory containing build.sbt. */
  def repoRoot: File = {
    var d = new File(".").getCanonicalFile
    while (d != null && !new File(d, "build.sbt").isFile)
      d = d.getParentFile
    require(d != null, "could not locate repo root (no build.sbt upward of cwd)")
    d
  }

  /** Run `python3 <script>` from the repo root; return (exitCode, output).
    * Fails (via require) if the script does not exist; kills the child
    * and throws if it exceeds `timeoutMinutes`. */
  def run(script: String, timeoutMinutes: Long = 10): (Int, String) = {
    val root = repoRoot
    val f = new File(root, script)
    require(f.isFile, s"$script not found under repo root $root — the " +
      "evidence-chain gate must fail, not skip, when its script is missing")
    val pb = new ProcessBuilder("python3", f.getPath)
    pb.directory(root)
    pb.redirectErrorStream(true)
    val p = pb.start()
    // Drain incrementally, appending per line under a lock: the earlier
    // src.mkString buffered everything inside the Source and appended
    // only at EOF, so a drain thread stuck on a grandchild's open pipe
    // meant TOTAL output loss (the "truncated" marker with nothing
    // before it) and the post-timeout read of the unsynchronized
    // builder was a data race (round-18 ADVICE).
    val sb = new StringBuilder
    val reader = new Thread(() => {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(
        p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      try {
        var line = br.readLine()
        while (line != null) {
          sb.synchronized { sb.append(line).append('\n') }
          line = br.readLine()
        }
      } finally br.close()
    })
    reader.setDaemon(true)
    reader.start()
    val finished = p.waitFor(timeoutMinutes, TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      throw new AssertionError(
        s"$script did not finish within $timeoutMinutes minutes — killed")
    }
    reader.join(10000)
    // a grandchild holding the stdout pipe open can leave the drain
    // thread alive past the join: mark the truncation — the lines
    // drained so far survive, and the synchronized read is safe
    val out = sb.synchronized {
      if (reader.isAlive)
        sb.toString + "\n<output truncated: reader still draining>"
      else sb.toString
    }
    (p.exitValue(), out)
  }
}
