package graft.operators

/** The ONE greedy LZ matcher every legacy-format encoder here shares
  * (implode, reduce, DCL-implode, deflate64): most-recent-pair
  * candidate via a 65536-entry position table, window-bounded,
  * greedy extension, positions registered across emitted match
  * bodies. Encoders differ only in (window, min/max match) and how
  * they serialize literals and matches — exactly the parameters.
  */
private[operators] object LzGreedy {

  def compress(data: Array[Byte], window: Int, minMatch: Int,
      maxMatch: Int)(emitLit: Int => Unit)(
      emitMatch: (Int, Int) => Unit): Unit = {
    val lastPos = new Array[Int](65536)
    java.util.Arrays.fill(lastPos, -1)
    def pairKey(j: Int): Int = ((data(j) & 0xFF) << 8) | (data(j + 1) & 0xFF)
    var i = 0
    while (i < data.length) {
      var matched = 0
      var dist = 0
      if (i + 1 < data.length) {
        val cand = lastPos(pairKey(i))
        if (cand >= 0 && i - cand <= window) {
          val d = i - cand
          var l = 0
          val lim = math.min(maxMatch, data.length - i)
          while (l < lim && data(i - d + l) == data(i + l)) l += 1
          if (l >= minMatch) { matched = l; dist = d }
        }
      }
      if (matched >= minMatch) {
        emitMatch(matched, dist)
        var k = 0
        while (k < matched && i + k + 1 < data.length) {
          lastPos(pairKey(i + k)) = i + k
          k += 1
        }
        i += matched
      } else {
        emitLit(data(i) & 0xFF)
        if (i + 1 < data.length) lastPos(pairKey(i)) = i
        i += 1
      }
    }
  }
}
