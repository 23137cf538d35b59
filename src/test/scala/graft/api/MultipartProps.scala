package graft.api

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck invariants for the multipart parser — a server-edge parser
  * must never throw on hostile bytes (the HTTP analog of the kernel's
  * error-as-column contract): arbitrary bodies, truncated/duplicated
  * boundaries, and binary part payloads that embed CRLFs and partial
  * boundary strings all return a (possibly empty) part list, and
  * well-formed round-trips recover every named part's exact bytes. */
object MultipartProps extends Properties("Multipart") {

  private val Boundary = "propb0undary"
  private val ct = s"multipart/form-data; boundary=$Boundary"

  private val genBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("never throws on arbitrary bodies") = Prop.forAll(genBytes) { body =>
    HttpApi.parseMultipart(ct, body)
    true
  }

  property("never throws on boundary-salted bodies") =
    Prop.forAll(genBytes, Gen.choose(0, 3)) { (body, n) =>
      // splice n copies of the boundary marker at pseudo-random offsets so
      // the scanner's delimiter states all get exercised
      val marker = s"--$Boundary".getBytes(StandardCharsets.ISO_8859_1)
      val out = new java.io.ByteArrayOutputStream()
      val step = math.max(1, body.length / (n + 1))
      var i = 0
      while (i < body.length) {
        out.write(body, i, math.min(step, body.length - i))
        out.write(marker)
        i += step
      }
      HttpApi.parseMultipart(ct, out.toByteArray)
      true
    }

  property("well-formed round-trip recovers exact part bytes") =
    Prop.forAll(Gen.nonEmptyListOf(genBytes)) { payloads =>
      val body = new java.io.ByteArrayOutputStream()
      payloads.zipWithIndex.foreach { case (data, i) =>
        body.write((s"--$Boundary\r\n" +
          s"""Content-Disposition: form-data; name="f$i"; filename="p$i.bin"\r\n""" +
          "\r\n").getBytes(StandardCharsets.ISO_8859_1))
        body.write(data)
        body.write("\r\n".getBytes(StandardCharsets.ISO_8859_1))
      }
      body.write(s"--$Boundary--\r\n".getBytes(StandardCharsets.ISO_8859_1))
      val parts = HttpApi.parseMultipart(ct, body.toByteArray)
      // parts whose payload contains the boundary marker legitimately split
      // differently; restrict the exact-recovery claim to clean payloads
      val marker = s"--$Boundary".getBytes(StandardCharsets.ISO_8859_1)
      def clean(d: Array[Byte]): Boolean =
        d.indexOfSlice(marker.toSeq) < 0
      if (payloads.forall(clean)) {
        val sizeOk = Prop(parts.size == payloads.size) :| s"${parts.size} vs ${payloads.size}"
        val partsOk = parts.zip(payloads).zipWithIndex.map { case ((p, d), i) =>
          val ok = p.name == s"f$i" && p.filename.contains(s"p$i.bin") &&
            java.util.Arrays.equals(p.data, d)
          Prop(ok) :| s"part $i mismatch"
        }
        Prop.all(sizeOk +: partsOk: _*)
      } else Prop(true)
    }
}
