package graft

/** Dev scratch check (round 19): progressive encode→decode must yield
  * byte-identical pixels to the baseline encode→decode of the SAME
  * quantized spectra, for every scan script — the scripts only change
  * HOW the spectrum is delivered. Exercises spectral selection,
  * successive approximation (DC and AC), EOB runs, ZRL-in-refinement.
  */
object ProgJpegCheck {
  import media.MediaFunctions._
  def main(args: Array[String]): Unit = {
    def coefs(id: Long)(c: Int, bi: Int): Array[Int] = {
      val z = new Array[Int](64)
      z(0) = (((id * 7 + c * 11 + bi * 5) % 64) - 32).toInt
      val z1 = (1 + ((id + bi + 3 * c) % 20)).toInt
      val a1 = (((id * 3 + bi * (c + 2)) % 9) - 4).toInt
      val z2 = (24 + ((id * 5 + bi * 3 + c) % 38)).toInt
      val a2 = (((id + bi + c * 7) % 5) - 2).toInt
      z(z1) = a1; z(z2) = a2
      z
    }
    val scripts: Seq[(String, Seq[ProgScan])] = Seq(
      "spectral_only" -> Seq(
        ProgScan(Seq(0, 1, 2), 0, 0, 0, 0),
        ProgScan(Seq(0), 1, 5, 0, 0), ProgScan(Seq(0), 6, 63, 0, 0),
        ProgScan(Seq(1), 1, 63, 0, 0), ProgScan(Seq(2), 1, 63, 0, 0)),
      "succ_approx" -> Seq(
        ProgScan(Seq(0, 1, 2), 0, 0, 0, 1),
        ProgScan(Seq(0), 1, 63, 0, 1),
        ProgScan(Seq(1), 1, 63, 0, 1), ProgScan(Seq(2), 1, 63, 0, 1),
        ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
        ProgScan(Seq(0), 1, 63, 1, 0),
        ProgScan(Seq(1), 1, 63, 1, 0), ProgScan(Seq(2), 1, 63, 1, 0)),
      "mixed_bands" -> Seq(
        ProgScan(Seq(0, 1, 2), 0, 0, 0, 1),
        ProgScan(Seq(0), 1, 20, 0, 1), ProgScan(Seq(0), 21, 63, 0, 1),
        ProgScan(Seq(1), 1, 63, 0, 1), ProgScan(Seq(2), 1, 63, 0, 1),
        ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
        ProgScan(Seq(0), 1, 20, 1, 0), ProgScan(Seq(0), 21, 63, 1, 0),
        ProgScan(Seq(1), 1, 63, 1, 0), ProgScan(Seq(2), 1, 63, 1, 0)),
      "deep_approx" -> Seq( // two refinement levels: 0,2 -> 2,1 -> 1,0
        ProgScan(Seq(0, 1, 2), 0, 0, 0, 2),
        ProgScan(Seq(0), 1, 63, 0, 2),
        ProgScan(Seq(1), 1, 63, 0, 2), ProgScan(Seq(2), 1, 63, 0, 2),
        ProgScan(Seq(0, 1, 2), 0, 0, 2, 1),
        ProgScan(Seq(0), 1, 63, 2, 1),
        ProgScan(Seq(1), 1, 63, 2, 1), ProgScan(Seq(2), 1, 63, 2, 1),
        ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
        ProgScan(Seq(0), 1, 63, 1, 0),
        ProgScan(Seq(1), 1, 63, 1, 0), ProgScan(Seq(2), 1, 63, 1, 0)))
    var fails = 0
    for (id <- 0L until 60L; (name, script) <- scripts) {
      val w = (8 + id % 17).toInt; val h = (8 + id % 15).toInt
      val base = decodeImage(encodeJpeg(w, h, coefs(id))).get
      val prog = decodeImage(encodeJpegProgressive(w, h, coefs(id), script))
      if (prog.isEmpty) { println(s"id=$id $name: REJECTED"); fails += 1 }
      else if (!java.util.Arrays.equals(prog.get.rgb, base.rgb)) {
        println(s"id=$id $name: PIXEL MISMATCH"); fails += 1
      }
    }
    println(if (fails == 0) "ALL OK (240 roundtrips)" else s"$fails FAILURES")
  }
}
