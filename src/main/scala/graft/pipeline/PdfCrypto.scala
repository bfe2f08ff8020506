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
  *  - AES-256-CBC (V 5 / R 6, /CFM /AESV3, ISO 32000-2 §7.6.4): the
  *    hardened hash 2.B key derivation, /U //O //UE //OE validation and
  *    the /Perms integrity check; the deprecated interim R 5 rejects;
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

  // ─────────────────────────── V 5 / R 6 (AES-256, ISO 32000-2 §7.6.4)

  private def sha(algo: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(algo)
    parts.foreach(d.update)
    d.digest()
  }

  private[pipeline] def aesCbcNoPad(mode: Int, key: Array[Byte], iv: Array[Byte],
                                    data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def aesEcbNoPad(mode: Int, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  /** Algorithm 2.B (ISO 32000-2, R 6): the hardened password hash. The
    * SHA-256 of (password ‖ salt ‖ udata) is kneaded through at least 64
    * rounds of AES-128-CBC over 64 repetitions of (password ‖ K ‖
    * udata), each round re-hashed with SHA-256/384/512 selected by the
    * first 16 encrypted bytes mod 3, until round ≥ 64 and the last
    * encrypted byte ≤ round − 32. `udata` is the 48-byte /U value for
    * owner-password hashes, empty for user-password hashes. */
  private[pipeline] def hash2B(password: Array[Byte], salt: Array[Byte],
                               udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var round = 0
    var done = false
    var lastE = 0
    while (!done) {
      val one = password ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(one, 0, k1, i * one.length, one.length); i += 1 }
      val e = aesCbcNoPad(Cipher.ENCRYPT_MODE,
        java.util.Arrays.copyOfRange(k, 0, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      var mod = 0
      var j = 0
      while (j < 16) { mod += e(j) & 0xff; j += 1 }
      k = (mod % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      lastE = e(e.length - 1) & 0xff
      round += 1
      done = round >= 64 && lastE <= round - 32
    }
    k.take(32)
  }

  /** Memo for [[verifyV5]], keyed by the FULL crypto inputs (password +
    * /O /U /OE /UE bytes) — the hardened KDF is deliberately ~1 ms, and
    * a corpus re-encrypted under one policy re-derives the same key per
    * file; keying by every input byte means a hit can never return a
    * wrong key. Bounded (executor-lifetime, 256 entries). */
  private val v5KeyMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Option[Array[Byte]]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Option[Array[Byte]]]): Boolean = size() > 256
      })

  /** Algorithm 2.A: retrieve the 32-byte file key for a V5/R6 file with
    * password `pw` — user path first, then owner. `o`/`u` are the
    * 48-byte /O and /U values (32-byte hash ‖ 8-byte validation salt ‖
    * 8-byte key salt); `oe`/`ue` the 32-byte /OE and /UE. None = the
    * password opens neither door. */
  private[graft] def verifyV5(pw: String, o: Array[Byte], u: Array[Byte],
                              oe: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    val memoKey = {
      val d = MessageDigest.getInstance("SHA-256")
      d.update(pw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Seq(o, u, oe, ue).foreach { b => d.update(b.length.toByte); d.update(b) }
      d.digest().map(x => f"${x & 0xff}%02x").mkString
    }
    val hit = v5KeyMemo.get(memoKey)
    if (hit != null) return hit.map(_.clone())
    val computed = verifyV5Uncached(pw, o, u, oe, ue)
    v5KeyMemo.put(memoKey, computed.map(_.clone()))
    computed
  }

  private def verifyV5Uncached(pw: String, o: Array[Byte], u: Array[Byte],
                               oe: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    // SASLprep is a no-op for the empty/ASCII passwords in scope
    val pwb = pw.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    val zeroIv = new Array[Byte](16)
    val uHash = java.util.Arrays.copyOfRange(u, 0, 32)
    val uVSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val uKSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    if (hash2B(pwb, uVSalt, Array.emptyByteArray).sameElements(uHash))
      Some(aesCbcNoPad(Cipher.DECRYPT_MODE,
        hash2B(pwb, uKSalt, Array.emptyByteArray), zeroIv, ue))
    else {
      val u48 = u.take(48)
      val oHash = java.util.Arrays.copyOfRange(o, 0, 32)
      val oVSalt = java.util.Arrays.copyOfRange(o, 32, 40)
      val oKSalt = java.util.Arrays.copyOfRange(o, 40, 48)
      if (hash2B(pwb, oVSalt, u48).sameElements(oHash))
        Some(aesCbcNoPad(Cipher.DECRYPT_MODE, hash2B(pwb, oKSalt, u48), zeroIv, oe))
      else None
    }
  }

  /** Validate the /Perms entry against the recovered file key (ISO
    * 32000-2 §7.6.4.4.12): AES-256-ECB decrypt must reveal 'adb' at
    * bytes 9–11, the P value at bytes 0–3 (little-endian) and the
    * EncryptMetadata flag at byte 8 — a mismatch means the wrong key or
    * a tampered dictionary, and decrypting with it would emit garbage. */
  private[pipeline] def validatePerms(perms: Array[Byte], key: Array[Byte],
                                      p: Int, encryptMetadata: Boolean): Unit = {
    require(perms.length >= 16,
      s"PdfCodec: encrypted PDF: /Perms is ${perms.length} bytes, want 16")
    val plain = aesEcbNoPad(Cipher.DECRYPT_MODE, key, perms.take(16))
    require(plain(9) == 'a' && plain(10) == 'd' && plain(11) == 'b',
      "PdfCodec: encrypted PDF: /Perms does not validate under the recovered key " +
        "(tampered encryption dictionary?)")
    val pGot = (plain(0) & 0xff) | ((plain(1) & 0xff) << 8) |
      ((plain(2) & 0xff) << 16) | ((plain(3) & 0xff) << 24)
    require(pGot == p,
      s"PdfCodec: encrypted PDF: /Perms P $pGot contradicts the /Encrypt dict P $p")
    // bytes 4-7 are required 0xFFFFFFFF and byte 8 exactly 'T' or 'F'
    // (ISO 32000-2 §7.6.4.4.12) — anything else is a tampered or
    // wrongly-keyed blob, not a legal EncryptMetadata=false
    var fi = 4
    while (fi < 8) {
      require(plain(fi) == 0xff.toByte,
        s"PdfCodec: encrypted PDF: /Perms byte $fi is not 0xFF (tampered blob?)")
      fi += 1
    }
    require(plain(8) == 'T' || plain(8) == 'F',
      "PdfCodec: encrypted PDF: /Perms byte 8 is neither 'T' nor 'F' (tampered blob?)")
    val emGot = plain(8) == 'T'
    require(emGot == encryptMetadata,
      "PdfCodec: encrypted PDF: /Perms EncryptMetadata flag contradicts the dict")
  }

  /** Per-object decryptor for one opened file (Algorithm 1; for V5 the
    * 32-byte file key is used directly — Algorithm 1.A has no per-object
    * key derivation). */
  private[graft] final class Decryptor(key: Array[Byte], aes: Boolean,
                                       v5: Boolean = false) {
    private def objectKey(num: Int, gen: Int): Array[Byte] = {
      if (v5) return key // Algorithm 1.A: the file key itself, every object
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
      // PDF 2.0 (ISO 32000-2) AES-256, hardened R6 key derivation
      case "aes-256" => (5, 6, 32, true)
      case other => throw new IllegalArgumentException(
        s"PdfCrypto: unsupported encryption mode '$other' " +
          "(rc4-40, rc4-128, aes-128, rc4-40-v4, aes-256)")
    }
    val p: Int = -4 // all permissions granted, reserved bits per Table 22
    val idFirst: Array[Byte] = md5("graft-pdf-id".getBytes(ISO_8859_1))
    /** (o, u, key, oe, ue, perms) — the last three empty below V 5.
      * Deterministic salts (the writer exists to gate the reader; secrecy
      * is not its job, reproducible fixtures are). */
    private val fields: (Array[Byte], Array[Byte], Array[Byte],
                         Array[Byte], Array[Byte], Array[Byte]) =
      if (v == 5) {
        import java.nio.charset.StandardCharsets.UTF_8
        val fk = MessageDigest.getInstance("SHA-256")
          .digest("graft-aes256-filekey".getBytes(ISO_8859_1))
        val pwb = userPw.getBytes(UTF_8).take(127)
        val opwb = ownerPw.getBytes(UTF_8).take(127)
        val uVS = md5("graft-user-vsalt".getBytes(ISO_8859_1)).take(8)
        val uKS = md5("graft-user-ksalt".getBytes(ISO_8859_1)).take(8)
        val oVS = md5("graft-owner-vsalt".getBytes(ISO_8859_1)).take(8)
        val oKS = md5("graft-owner-ksalt".getBytes(ISO_8859_1)).take(8)
        val zeroIv = new Array[Byte](16)
        val u48 = hash2B(pwb, uVS, Array.emptyByteArray) ++ uVS ++ uKS
        val ue = aesCbcNoPad(Cipher.ENCRYPT_MODE,
          hash2B(pwb, uKS, Array.emptyByteArray), zeroIv, fk)
        val o48 = hash2B(opwb, oVS, u48) ++ oVS ++ oKS
        val oe = aesCbcNoPad(Cipher.ENCRYPT_MODE, hash2B(opwb, oKS, u48), zeroIv, fk)
        val permsPlain = le4(p) ++ Array.fill(4)(0xff.toByte) ++
          Array[Byte](if (encryptMetadata) 'T' else 'F', 'a', 'd', 'b') ++
          md5("graft-perms-fill".getBytes(ISO_8859_1)).take(4)
        val perms = {
          val c = Cipher.getInstance("AES/ECB/NoPadding")
          c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(fk, "AES"))
          c.doFinal(permsPlain)
        }
        (o48, u48, fk, oe, ue, perms)
      } else {
        val o0 = ownerEntry(ownerPw, userPw, r, keyBytes)
        val k0 = fileKey(userPw, o0, p, idFirst, r, keyBytes, encryptMetadata)
        (o0, userEntry(k0, idFirst, r), k0,
          Array.emptyByteArray, Array.emptyByteArray, Array.emptyByteArray)
      }
    val o: Array[Byte] = fields._1
    val u: Array[Byte] = fields._2
    val key: Array[Byte] = fields._3
    def decryptor: Decryptor = new Decryptor(key, aes, v5 = v == 5)

    private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

    /** The /Encrypt dictionary body (written as one top-level object). */
    def dict: String = {
      if (v == 5) {
        val em = if (encryptMetadata) "" else " /EncryptMetadata false"
        return s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $p$em " +
          s"/O <${hex(o)}> /U <${hex(u)}> /OE <${hex(fields._4)}> /UE <${hex(fields._5)}> " +
          s"/Perms <${hex(fields._6)}> " +
          "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF >>"
      }
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
