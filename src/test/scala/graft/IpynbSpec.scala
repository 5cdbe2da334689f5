package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ipynb

/** Jupyter-notebook extraction conformance: hand-built nbformat-4
  * documents (both source shapes), synth round-trip, a live
  * python3-json structural validation of the synth output, and the
  * damage/profile split.
  */
class IpynbSpec extends AnyFunSuite {

  test("hand-built notebooks parse, both source shapes") {
    val nb =
      """{"cells":[
        |{"cell_type":"code","execution_count":2,"metadata":{},
        | "outputs":[{"output_type":"stream","text":["hi\n"]}],
        | "source":["a = 1\n","b = a + 1\n"]},
        |{"cell_type":"markdown","metadata":{},
        | "source":"# One string, not an array"},
        |{"cell_type":"code","execution_count":null,"metadata":{},
        | "outputs":[],"source":[]}
        |],"metadata":{},"nbformat":4,"nbformat_minor":5}""".stripMargin
    val cells = Ipynb.cells(nb)
    assert(cells != null && cells.length == 3)
    assert(cells(0).cellType == "code" && cells(0).execCount == 2L)
    assert(cells(0).source == "a = 1\nb = a + 1\n" && cells(0).nOutputs == 1)
    assert(cells(1).cellType == "markdown")
    assert(cells(1).source == "# One string, not an array")
    assert(cells(2).execCount == -1L && cells(2).source == "")
  }

  test("synth round-trips and validates through python json (gated)") {
    val specs = Seq(
      ("code", "import os\nprint(os.name)\n", 1L, 2),
      ("markdown", "# Title\nBody text\n", -1L, 0),
      ("code", "x = 1", 2L, 0))
    val json = Ipynb.synth(specs)
    val cells = Ipynb.cells(json)
    assert(cells != null && cells.length == 3)
    for (((tpe, src, exec, nOut), c) <- specs.zip(cells)) {
      assert(c.cellType == tpe)
      assert(c.source == src, s"$tpe source")
      if (tpe == "code") {
        assert(c.execCount == exec)
        assert(c.nOutputs == nOut)
      }
    }
    // live: the reference json parser agrees on the structure
    val p = new ProcessBuilder("python3", "-c",
      """import json,sys
        |nb = json.load(sys.stdin)
        |assert nb['nbformat'] == 4
        |assert len(nb['cells']) == 3
        |assert ''.join(nb['cells'][0]['source']) == 'import os\nprint(os.name)\n'
        |assert nb['cells'][0]['execution_count'] == 1
        |assert len(nb['cells'][0]['outputs']) == 2
        |assert nb['cells'][1]['cell_type'] == 'markdown'
        |print('OK')""".stripMargin).start()
    p.getOutputStream.write(json.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    if (p.waitFor() == 0) assert(out.trim == "OK", out)
    else cancel(s"python3 unavailable or failed: $out")
  }

  test("damage and profile split") {
    assert(Ipynb.cells("{not json") == null)
    assert(Ipynb.cells("""{"cells":[],"nbformat":4}""").length == 0)
    assert(Ipynb.cells("""{"cells":"nope","nbformat":4}""") == null)
    assert(Ipynb.cells("""{"worksheets":[],"nbformat":3}""") == null)
    assert(Ipynb.unsupportedProfile("""{"worksheets":[],"nbformat":3}"""))
    assert(!Ipynb.unsupportedProfile("""{"cells":[],"nbformat":4}"""))
    assert(!Ipynb.unsupportedProfile("{broken"))
    // a cell with a non-string source entry is damage
    assert(Ipynb.cells(
      """{"cells":[{"cell_type":"code","source":[1]}],"nbformat":4}""")
      == null)
  }
}
