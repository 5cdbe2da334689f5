package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gguf

/** GGUF v3 layout conformance — spec-constructed fixtures (no gguf
  * implementation ships in this container; the safetensors posture):
  * KV value-type coverage, tensor descriptor walk, damage degradation.
  */
class GgufSpec extends AnyFunSuite {

  private val kv: Seq[(String, Any)] = Seq(
    "general.architecture" -> "llama",
    "general.name" -> "tiny-test",
    "llama.context_length" -> 2048L, // u32
    "llama.rope.scale" -> 1.5f,
    "general.quantized" -> true,
    "general.flags" -> 7, // i32
    "tokenizer.ggml.tokens" -> Seq("<s>", "</s>", "héllo"))

  private val tensors = Seq(
    ("tok_embd.weight", Array(4096L, 32000L), 12),
    ("blk.0.attn_q.weight", Array(4096L, 4096L), 8),
    ("output_norm.weight", Array(4096L), 0))

  test("synth v3 files read back: header, every KV type, descriptors") {
    val g = Gguf.read(Gguf.synthGguf(kv, tensors))
    assert(g != null && g.version == 3)
    assert(g.kv("general.architecture") == "llama")
    assert(g.kv("general.name") == "tiny-test")
    assert(g.kv("llama.context_length") == 2048L)
    assert(g.kv("llama.rope.scale") == 1.5f)
    assert(g.kv("general.quantized") == true)
    assert(g.kv("general.flags") == 7)
    assert(g.kv("tokenizer.ggml.tokens") ==
      Vector("<s>", "</s>", "héllo"))
    assert(g.tensors.map(_.name).toSeq == tensors.map(_._1))
    assert(g.tensors(0).dims.toSeq == Seq(4096L, 32000L))
    assert(g.tensors.map(_.typeId).toSeq == Seq(12, 8, 0))
    assert(Gguf.TypeNames(g.tensors(0).typeId) == "q4_k")
    // offsets are declared monotonically
    assert(g.tensors.map(_.offset).toSeq == g.tensors.map(_.offset).toSeq.sorted)
  }

  test("damage degrades: version, truncation, bombs, byte flips") {
    val good = Gguf.synthGguf(kv, tensors)
    assert(Gguf.read("notgguf!".getBytes("UTF-8")) == null)
    // unsupported version
    val v1 = good.clone(); v1(4) = 1
    assert(Gguf.read(v1) == null)
    // truncations
    (1 until good.length by 7).foreach { cut =>
      Gguf.read(java.util.Arrays.copyOf(good, cut)) // never throws
    }
    assert(Gguf.read(java.util.Arrays.copyOf(good, 12)) == null)
    // hostile KV count
    val bomb = good.clone()
    java.util.Arrays.fill(bomb, 20, 28, 0xFF.toByte)
    assert(Gguf.read(bomb) == null)
    // random flips never throw
    val rnd = new scala.util.Random(5)
    (0 until 300).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Gguf.read(mut)
    }
  }
}
