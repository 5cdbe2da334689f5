package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GitPack

/** git packfile conformance, pinned BOTH directions against git
  * itself (live-gated): `git gc` packs from a real repository read
  * back object-for-object, and [[GitPack.synthPack]] output passes
  * `git index-pack` validation.
  */
class GitPackSpec extends AnyFunSuite {

  private def run(cwd: java.nio.file.Path, cmd: String*): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).directory(cwd.toFile)
      .redirectErrorStream(true).start()
    (p.waitFor(), new String(p.getInputStream.readAllBytes(), "UTF-8"))
  }

  private def rmTree(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("git-gc packs from a real repository read back (gated)") {
    assume(run(java.nio.file.Paths.get("/tmp"), "git", "--version")._1 == 0)
    val dir = java.nio.file.Files.createTempDirectory("gitp")
    try {
      def g(cmd: String*): Unit = {
        val (rc, out) = run(dir, ("git" +: cmd): _*)
        assert(rc == 0, s"git ${cmd.head}: $out")
      }
      g("init", "-q")
      g("config", "user.email", "t@x.test")
      g("config", "user.name", "t")
      val blobA = "fn main() { println!(\"alpha\"); }\n" * 20
      val blobB = "def beta():\n    return 42\n" * 15
      java.nio.file.Files.writeString(dir.resolve("a.rs"), blobA)
      java.nio.file.Files.writeString(dir.resolve("b.py"), blobB)
      g("add", ".")
      g("commit", "-q", "-m", "first")
      java.nio.file.Files.writeString(dir.resolve("a.rs"),
        blobA + "// appended\n")
      g("add", ".")
      g("commit", "-q", "-m", "second")
      g("gc", "-q", "--aggressive")
      val packDir = dir.resolve(".git/objects/pack")
      import scala.jdk.CollectionConverters._
      val packFile = java.nio.file.Files.list(packDir).iterator().asScala
        .find(_.toString.endsWith(".pack"))
      assert(packFile.isDefined, "no pack produced")
      val objs = GitPack.objects(
        java.nio.file.Files.readAllBytes(packFile.get))
      assert(objs != null, "pack failed to parse")
      val byType = objs.groupBy(_.tpe)
      assert(byType.getOrElse("commit", Array.empty).length == 2)
      assert(byType.getOrElse("tree", Array.empty).length >= 2)
      val blobTexts = byType("blob").map(o => new String(o.data, "UTF-8"))
      assert(blobTexts.contains(blobA + "// appended\n"))
      assert(blobTexts.contains(blobB))
      // the commit graph parses and links to a tree with our files
      val heads = byType("commit").flatMap(c =>
        Option(GitPack.commitInfo(c.data)))
      assert(heads.length == 2)
      val treeIds = heads.map(_._1).toSet
      val trees = byType("tree").filter(t => treeIds.contains(t.sha))
      assert(trees.nonEmpty, "commit tree not in pack")
      val names = trees.flatMap(t =>
        GitPack.treeEntries(t.data).map(_.name)).toSet
      assert(names.contains("a.rs") && names.contains("b.py"))
      // recomputed ids match git's own: ask git for the blob id
      val (rc, lsOut) = run(dir, "git", "rev-parse", "HEAD:b.py")
      assert(rc == 0)
      assert(byType("blob").exists(_.sha == lsOut.trim))
    } finally rmTree(dir)
  }

  test("synthPack output passes git index-pack (gated)") {
    assume(run(java.nio.file.Paths.get("/tmp"), "git", "--version")._1 == 0)
    val blob1 = ("pub fn gamma() -> u64 { 7 }\n" * 30).getBytes("UTF-8")
    val blob2 = ("SELECT * FROM t;\n" * 12).getBytes("UTF-8")
    val tree = GitPack.synthTree(Seq(
      ("100644", "g.rs", graft.operators.GitPack.objects(
        GitPack.synthPack(Seq(("blob", blob1))))(0).sha),
      ("100644", "q.sql", GitPack.objects(
        GitPack.synthPack(Seq(("blob", blob2))))(0).sha)))
    val treeSha = GitPack.objects(
      GitPack.synthPack(Seq(("tree", tree))))(0).sha
    val commit = GitPack.synthCommit(treeSha, Nil,
      "t <t@x.test> 1700000000 +0000", "synth commit")
    val pack = GitPack.synthPack(
      Seq(("commit", commit), ("tree", tree), ("blob", blob1),
        ("blob", blob2)),
      deltaAgainstPrev = Set(3)) // blob2 rides as OFS_DELTA on blob1
    // our own reader resolves the delta
    val objs = GitPack.objects(pack)
    assert(objs != null && objs.length == 4)
    assert(objs(3).tpe == "blob" && objs(3).data.toSeq == blob2.toSeq)
    // git validates the whole pack
    val dir = java.nio.file.Files.createTempDirectory("gitw")
    try {
      val f = dir.resolve("t.pack")
      java.nio.file.Files.write(f, pack)
      val (rc, out) = run(dir, "git", "index-pack", f.toString)
      assert(rc == 0, out)
      val (rc2, out2) = run(dir, "git", "verify-pack", "-v", f.toString)
      assert(rc2 == 0, out2)
      assert(out2.contains("blob") && out2.contains("commit"))
    } finally rmTree(dir)
  }

  test("damage degrades: trailer, truncation, delta bounds") {
    val pack = GitPack.synthPack(Seq(
      ("blob", ("x" * 500).getBytes("UTF-8")),
      ("blob", ("y" * 300).getBytes("UTF-8"))), Set(1))
    assert(GitPack.objects(pack) != null)
    val bad = pack.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x21).toByte
    assert(GitPack.objects(bad) == null) // trailer catches everything
    for (cut <- Seq(3, 11, 40, pack.length / 2))
      assert(GitPack.objects(
        java.util.Arrays.copyOf(pack, cut)) == null, s"cut=$cut")
    assert(GitPack.objects("PACKnope".getBytes("UTF-8")) == null)
    // delta ops out of bounds
    assert(GitPack.applyDelta(Array[Byte](1, 2, 3),
      Array[Byte](3, 5, 0x7F.toByte)) == null)
  }
}
