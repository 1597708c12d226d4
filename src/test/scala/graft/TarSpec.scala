package graft

import graft.plans.{TarMembers, TarPlant}

class TarSpec extends SparkSuite {

  /** Independent mini-writer (separate from TarPlant's encoder). */
  private def hdr(name: String, size: Int, tf: Char,
      prefix: String = "", corrupt: Boolean = false): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(at: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, at, b.length)
    }
    put(0, name)
    put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
    put(124, f"$size%011o"); put(136, "00000000000")
    h(156) = tf.toByte
    put(257, "ustar"); put(263, "00")
    if (prefix.nonEmpty) put(345, prefix)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var s = 0L; var i = 0
    while (i < 512) { s += h(i) & 0xff; i += 1 }
    put(148, f"$s%06o"); h(154) = 0; h(155) = ' '.toByte
    if (corrupt) h(148) = '7' // break the stored checksum
    h
  }

  private def tarOf(members: Seq[(String, Array[Byte], Char)],
      prefixFor: Map[String, String] = Map.empty,
      corruptAt: Int = -1, truncateLast: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    members.zipWithIndex.foreach { case ((name, payload, tf), i) =>
      bos.write(hdr(name, payload.length, tf,
        prefixFor.getOrElse(name, ""), corrupt = i == corruptAt))
      if (truncateLast && i == members.size - 1 && payload.length > 0)
        bos.write(payload, 0, payload.length / 2)
      else {
        bos.write(payload)
        bos.write(new Array[Byte]((512 - payload.length % 512) % 512))
      }
    }
    if (!truncateLast) bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  private def names(b: Array[Byte]): Seq[String] = {
    val arr = TarMembers.parse(b)
    (0 until arr.numElements()).map(i =>
      arr.getStruct(i, 4).getUTF8String(0).toString)
  }

  test("plant round-trips: 7 members, closed-form names/sizes/payloads") {
    for (id <- Seq(0L, 1L, 7L, 12L, 99L)) {
      val arr = TarMembers.parse(TarPlant.encode(id))
      assert(arr.numElements() == 7)
      val m1 = arr.getStruct(1, 4)
      assert(m1.getUTF8String(0).toString == s"s${id}_0.txt")
      val txt = new String(m1.getBinary(3), "US-ASCII")
      assert(txt == TarPlant.txtOf(id, 0))
      assert(m1.getLong(2) == txt.length.toLong)
      val dir = arr.getStruct(0, 4)
      assert(dir.getUTF8String(1).toString == "5" && dir.getLong(2) == 0L)
    }
  }

  test("exact-512 and empty payloads frame correctly via the independent writer") {
    val p512 = Array.fill[Byte](512)('x'.toByte)
    val t = tarOf(Seq(("a.bin", p512, '0'), ("b.txt", "hi".getBytes, '0'),
      ("c.empty", Array.emptyByteArray, '0')))
    val arr = TarMembers.parse(t)
    assert(names(t) == Seq("a.bin", "b.txt", "c.empty"))
    assert(arr.getStruct(0, 4).getLong(2) == 512L)
    assert(new String(arr.getStruct(1, 4).getBinary(3)) == "hi")
    assert(arr.getStruct(2, 4).getLong(2) == 0L)
  }

  test("checksum corruption ends the walk, keeping earlier members") {
    val t = tarOf(Seq(("ok.txt", "one".getBytes, '0'),
      ("bad.txt", "two".getBytes, '0'),
      ("after.txt", "three".getBytes, '0')), corruptAt = 1)
    assert(names(t) == Seq("ok.txt"))
  }

  test("truncated payload drops the partial member, keeps prior ones") {
    val t = tarOf(Seq(("ok.txt", "one".getBytes, '0'),
      ("cut.bin", Array.fill[Byte](600)('z'.toByte), '0')), truncateLast = true)
    assert(names(t) == Seq("ok.txt"))
  }

  test("ustar prefix field extends the member name") {
    val t = tarOf(Seq(("leaf.txt", "p".getBytes, '0')),
      prefixFor = Map("leaf.txt" -> "deep/dir/chain"))
    assert(names(t) == Seq("deep/dir/chain/leaf.txt"))
  }

  test("bytes after the end blocks are ignored") {
    val base = tarOf(Seq(("a.txt", "x".getBytes, '0')))
    val noise = base ++ hdr("ghost.txt", 1, '0') ++ new Array[Byte](512)
    assert(names(noise) == Seq("a.txt"))
  }

  test("media shard: png payloads survive the walk byte-exact") {
    import graft.plans.{PngDhash, TarPlantMedia}
    for (id <- Seq(1L, 6L, 13L)) {
      val arr = TarMembers.parse(TarPlantMedia.encode(id))
      assert(arr.numElements() == 4) // 2 samples x (png, cls)
      for (j <- 0 to 1) {
        val png = arr.getStruct(j * 2, 4)
        assert(png.getUTF8String(0).toString == s"s${id}_$j.png")
        val direct = PngDhash.compute(
          graft.plans.PngPlant.encode(TarPlantMedia.seedOf(id, j)), 4, 4)
        val viaTar = PngDhash.compute(png.getBinary(3), 4, 4)
        assert((direct == null) == (viaTar == null))
        if (direct != null)
          assert(direct.getLong(2) == viaTar.getLong(2),
            s"payload must round-trip byte-exact (id=$id j=$j)")
      }
    }
  }

  test("NUL typeflag reads as regular file '0'") {
    val h = hdr("plain.txt", 2, '0')
    // rewrite typeflag to NUL and re-checksum
    h(156) = 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var s = 0L; var i = 0
    while (i < 512) { s += h(i) & 0xff; i += 1 }
    val cs = f"$s%06o".getBytes("US-ASCII")
    System.arraycopy(cs, 0, h, 148, cs.length); h(154) = 0; h(155) = ' '.toByte
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(h); bos.write("ab".getBytes); bos.write(new Array[Byte](510))
    bos.write(new Array[Byte](1024))
    val arr = TarMembers.parse(bos.toByteArray)
    assert(arr.numElements() == 1)
    assert(arr.getStruct(0, 4).getUTF8String(1).toString == "0")
  }
}
