package graft.tools

import java.nio.file.{Files, Path}
import scala.sys.process._

/** Git revision source (reference: S8, checkout_file_revisions
  * de/fileutils.py:7-64): enumerate all revisions of a file and materialize
  * each as `{stem}-{rev}{suffix}` under a target directory, producing the
  * path list that feeds the estimator ("how much does dedup save across my
  * file's history"). Driver-side by design — shelling to git is not a
  * distributed op (SURVEY §2.1-S8).
  */
object GitRevisions {

  /** All commit hashes that touched `file`, newest first (follows renames,
    * skips deletions — the reference's `git log --follow --diff-filter=d`).
    */
  def listRevisions(file: Path): Seq[String] = {
    val dir = file.toAbsolutePath.getParent.toString
    Seq("git", "-C", dir, "log", "--follow", "--diff-filter=d", "--format=%H",
      "--", file.getFileName.toString).!!.linesIterator.map(_.trim)
      .filter(_.nonEmpty).toSeq
  }

  /** Materialize each revision's content; returns written paths (newest
    * first). `fromRev`/`untilRev` bound the (inclusive) slice by hash
    * prefix, mirroring the reference's --from-rev/--until-rev.
    */
  def checkoutFileRevisions(
      file: Path,
      targetDir: Path,
      fromRev: Option[String] = None,
      untilRev: Option[String] = None): Seq[Path] = {
    val abs = file.toAbsolutePath
    val dir = abs.getParent.toString
    val repoRoot = Seq("git", "-C", dir, "rev-parse", "--show-toplevel").!!.trim
    val rel = java.nio.file.Paths.get(repoRoot).relativize(abs).toString
    val all = listRevisions(file)
    val start = fromRev.map(r => all.indexWhere(_.startsWith(r))).filter(_ >= 0).getOrElse(0)
    val end = untilRev.map(r => all.indexWhere(_.startsWith(r))).filter(_ >= 0)
      .map(_ + 1).getOrElse(all.size)
    val slice = all.slice(start, end)
    Files.createDirectories(targetDir)
    val name = abs.getFileName.toString
    val (stem, suffix) = name.lastIndexOf('.') match {
      case -1 => (name, "")
      case i => (name.substring(0, i), name.substring(i))
    }
    slice.map { rev =>
      val out = targetDir.resolve(s"$stem-${rev.take(12)}$suffix")
      // byte-exact extraction: stream git output straight to the file
      val code = (Seq("git", "-C", repoRoot, "show", s"$rev:$rel") #> out.toFile).!
      require(code == 0, s"git show failed for $rev:$rel")
      out
    }
  }
}
