package graft.pipeline

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** The PDF STANDARD SECURITY HANDLER (ISO 32000-1 §7.6.3) for the
  * empty-user-password case — the common real-world shape where a writer
  * encrypts only to carry permission flags, and every reader opens the
  * file transparently (PDFBox does exactly this inside the reference's
  * Function.java:90-132 load). Scope:
  *
  *  - RC4-40 (V 1 / R 2), RC4-128 (V 2 / R 3), AES-128-CBC
  *    (V 4 / R 4, /CFM /AESV2) — the §7.6 algorithms 1–6 verbatim;
  *  - the USER password must verify as EMPTY (algorithm 6); a file
  *    keyed to a real password fails loud with the real reason, never
  *    garbage output;
  *  - stream decryption only: text extraction reads strings out of
  *    (decrypted) content/ToUnicode streams, and §7.6.2 exempts the
  *    xref stream and the /Encrypt dictionary itself, which the caller
  *    skips. Objects inside an ObjStm are covered by the container's
  *    encryption, per spec.
  *
  * RC4 is implemented inline (15 lines, public algorithm) because the
  * JDK's RC4 cipher is deprecated-for-removal; AES rides the always-
  * present JDK AES/CBC provider. */
private[graft] object PdfCrypto {

  /** §7.6.3.3 padding string (table 8.3/32000-1 Algorithm 2 step a). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def padPassword(pw: String): Array[Byte] =
    (pw.getBytes(ISO_8859_1).take(32) ++ Pad).take(32)

  /** Plain RC4 (ARC4) — symmetric, used for both directions. */
  private[pipeline] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    for (n <- data.indices) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(n) = (data(n) ^ s((s(i) + s(j)) & 0xff)).toByte
    }
    out
  }

  private def le4(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(b => (b & 0xff).toByte)

  /** Algorithm 2: file encryption key from a (user) password. */
  private[pipeline] def fileKey(pw: String, o: Array[Byte], p: Int,
                                idFirst: Array[Byte], r: Int, keyBytes: Int,
                                encryptMetadata: Boolean = true): Array[Byte] = {
    val extra = if (r >= 4 && !encryptMetadata) Array.fill(4)(0xff.toByte)
                else Array.emptyByteArray
    var h = md5(padPassword(pw), o, le4(p), idFirst, extra)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(keyBytes))
    h.take(keyBytes)
  }

  /** Algorithm 3: the /O value (owner password entry). */
  private[pipeline] def ownerEntry(ownerPw: String, userPw: String,
                                   r: Int, keyBytes: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPw))
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val k0 = h.take(keyBytes)
    var o = rc4(k0, padPassword(userPw))
    if (r >= 3) for (i <- 1 to 19)
      o = rc4(k0.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithms 4 (R 2) / 5 (R ≥ 3): the /U value from the file key. */
  private[pipeline] def userEntry(key: Array[Byte], idFirst: Array[Byte],
                                  r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, idFirst))
      for (i <- 1 to 19) u = rc4(key.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16) // arbitrary 16-byte tail per Algorithm 5 step f
    }

  /** Algorithm 6: does `pw` open this file as the USER password? */
  private[pipeline] def verifyUser(pw: String, o: Array[Byte], u: Array[Byte],
                                   p: Int, idFirst: Array[Byte], r: Int,
                                   keyBytes: Int,
                                   encryptMetadata: Boolean = true): Option[Array[Byte]] = {
    val key = fileKey(pw, o, p, idFirst, r, keyBytes, encryptMetadata)
    val expect = userEntry(key, idFirst, r)
    val ok = if (r == 2) expect.sameElements(u)
             else expect.take(16).sameElements(u.take(16))
    if (ok) Some(key) else None
  }

  /** Per-object decryptor for one opened file (Algorithm 1). */
  private[graft] final class Decryptor(key: Array[Byte], aes: Boolean) {
    private def objectKey(num: Int, gen: Int): Array[Byte] = {
      val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
      md5(key,
        Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte),
        Array((gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
        salt).take(math.min(key.length + 5, 16))
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val ok = objectKey(num, gen)
      if (!aes) rc4(ok, data)
      else {
        // ≥ 32: IV plus at least the mandatory PKCS#5 padding block — a
        // bare-IV 16-byte stream would otherwise reach plain.last on an
        // EMPTY plaintext and throw an unlabeled NoSuchElementException
        require(data.length >= 32 && data.length % 16 == 0,
          s"PdfCodec: object $num: AES stream length ${data.length} not a " +
            "whole number of blocks with a leading IV and a padded payload")
        val c = Cipher.getInstance("AES/CBC/NoPadding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(ok, "AES"),
          new IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data.drop(16))
        val padLen = plain.last & 0xff
        require(padLen >= 1 && padLen <= 16 && padLen <= plain.length,
          s"PdfCodec: object $num: corrupt AES padding ($padLen)")
        plain.dropRight(padLen)
      }
    }

    def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val ok = objectKey(num, gen)
      if (!aes) rc4(ok, data)
      else {
        val padLen = 16 - data.length % 16
        val padded = data ++ Array.fill(padLen)(padLen.toByte)
        // deterministic IV (legal — the IV only needs to be unpredictable
        // for confidentiality, and this writer exists to gate the reader)
        val iv = md5(Array(num.toByte, gen.toByte),
          "graft-pdf-iv".getBytes(ISO_8859_1)).take(16)
        val c = Cipher.getInstance("AES/CBC/NoPadding")
        c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(ok, "AES"), new IvParameterSpec(iv))
        iv ++ c.doFinal(padded)
      }
    }
  }

  /** Writer-side spec: one of the three supported modes, with the user
    * password empty by default (the permissions-only encryption shape). */
  private[graft] final case class EncryptSpec(mode: String, userPw: String = "",
                                              ownerPw: String = "graft-owner",
                                              encryptMetadata: Boolean = true) {
    val (v, r, keyBytes, aes) = mode match {
      case "rc4-40" => (1, 2, 5, false)
      case "rc4-128" => (2, 3, 16, false)
      case "aes-128" => (4, 4, 16, true)
      // V4 crypt-filter clothing around a 40-bit RC4 key: /CF /Length is
      // written in BITS (spec-legal; readers must disambiguate 40 —
      // ADVICE r10's bits-vs-bytes case)
      case "rc4-40-v4" => (4, 4, 5, false)
      case other => throw new IllegalArgumentException(
        s"PdfCrypto: unsupported encryption mode '$other' (rc4-40, rc4-128, aes-128, rc4-40-v4)")
    }
    val p: Int = -4 // all permissions granted, reserved bits per Table 22
    val idFirst: Array[Byte] = md5("graft-pdf-id".getBytes(ISO_8859_1))
    val o: Array[Byte] = ownerEntry(ownerPw, userPw, r, keyBytes)
    val key: Array[Byte] = fileKey(userPw, o, p, idFirst, r, keyBytes, encryptMetadata)
    val u: Array[Byte] = userEntry(key, idFirst, r)
    def decryptor: Decryptor = new Decryptor(key, aes)

    private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

    /** The /Encrypt dictionary body (written as one top-level object). */
    def dict: String = {
      val cf = if (aes)
        " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF"
      else if (v == 4)
        // bits, not bytes: the ambiguous-but-legal writer form
        s" /CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen /Length ${keyBytes * 8} >> >> " +
          "/StmF /StdCF /StrF /StdCF"
      else ""
      val em = if (encryptMetadata) "" else " /EncryptMetadata false"
      s"<< /Filter /Standard /V $v /R $r /Length ${keyBytes * 8} /P $p$em " +
        s"/O <${hex(o)}> /U <${hex(u)}>$cf >>"
    }

    /** Trailer additions: the ref to the /Encrypt object and the /ID. */
    def trailerExtra(encNum: Int): String =
      s"/Encrypt $encNum 0 R /ID [ <${hex(idFirst)}> <${hex(idFirst)}> ] "
  }
}
