package graft.sources

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

import Msgpack._

/** The Forward protocol's shared-key authentication handshake — the
  * `security` half of the reference's `plugins/in_forward/fw_prot.c`:
  *
  * {{{
  * server → ["HELO", {"nonce": n16, "auth": salt-or-"", "keepalive": true}]   (:281-295)
  * client → ["PING", hostname, key_salt, hex(sha512(key_salt + hostname
  *            + nonce + shared_key)), username, password_digest]              (:574-650)
  * server → ["PONG", ok, reason, self_hostname, hex(sha512(key_salt
  *            + self_hostname + nonce + shared_key))]                         (:711-767)
  * }}}
  *
  * The digest layouts mirror `flb_secure_forward_hash_shared_key` /
  * `hash_digest` (fw_prot.c:321-412): SHA-512 over the concatenation of
  * (salt, hostname, nonce, shared_key), hex-lowercase. User/password
  * auth follows `flb_secure_forward_password_digest` (:414-451):
  * sha512(auth_salt + username + password).
  *
  * Nonce/salt are generated as 16 ASCII hex chars (fluentd's in_forward
  * does the same via SecureRandom.hex; the C reference sends raw random
  * bytes packed as msgpack str — `MStr.bytes` preserves the undecoded
  * wire slice, so digests are computed over the peer's exact bytes even
  * when they are not valid UTF-8).
  */
object SecureForward {

  private val rnd = new java.security.SecureRandom()

  /** 16 ASCII hex chars (8 random bytes hex-expanded). */
  def newNonce(): String = {
    val b = new Array[Byte](8)
    rnd.nextBytes(b)
    b.map(x => f"${x & 0xff}%02x").mkString
  }

  def sha512hex(parts: Seq[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-512")
    parts.foreach(md.update)
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  /** hex(sha512(salt + hostname + nonce + shared_key)) — fw_prot.c:321. */
  def sharedKeyDigest(salt: String, hostname: String, nonce: String,
                      sharedKey: String): String =
    sharedKeyDigest(salt.getBytes(StandardCharsets.UTF_8),
      hostname.getBytes(StandardCharsets.UTF_8),
      nonce.getBytes(StandardCharsets.UTF_8), sharedKey)

  /** Byte-exact variant: salt/hostname/nonce are wire bytes from the
    * peer (the C reference sends raw random bytes, fw_prot.c:205-208).
    */
  def sharedKeyDigest(salt: Array[Byte], hostname: Array[Byte],
                      nonce: Array[Byte], sharedKey: String): String =
    sha512hex(Seq(salt, hostname, nonce,
      sharedKey.getBytes(StandardCharsets.UTF_8)))

  /** hex(sha512(auth_salt + username + password)) — fw_prot.c:414. */
  def passwordDigest(authSalt: String, username: String,
                     password: String): String =
    passwordDigest(authSalt.getBytes(StandardCharsets.UTF_8), username,
      password)

  def passwordDigest(authSalt: Array[Byte], username: String,
                     password: String): String =
    sha512hex(Seq(authSalt, username.getBytes(StandardCharsets.UTF_8),
      password.getBytes(StandardCharsets.UTF_8)))

  /** Constant-time digest equality — authentication-path comparisons
    * must not leak a timing signal on the first differing byte.
    */
  def digestEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** Read exactly one msgpack object from the stream (handshake frames
    * are single small objects; 64 KiB cap guards a hostile peer).
    */
  def readOne(in: InputStream): V = {
    var pending = Array.emptyByteArray
    val chunk = new Array[Byte](4096)
    while (pending.length < 64 * 1024) {
      try return Msgpack.decode(pending, 0)._1
      catch { case _: Msgpack.Incomplete => () }
      val n = in.read(chunk)
      if (n < 0) throw new java.io.EOFException("peer closed during handshake")
      val merged = new Array[Byte](pending.length + n)
      System.arraycopy(pending, 0, merged, 0, pending.length)
      System.arraycopy(chunk, 0, merged, pending.length, n)
      pending = merged
    }
    throw new IllegalArgumentException("handshake frame exceeds 64KiB")
  }

  private def mapGet(m: V, key: String): Option[V] = m match {
    case MMap(es) => es.collectFirst { case (MStr(`key`), v) => v }
    case _ => None
  }

  private def asStr(v: V): String = v match {
    case MStr(s) => s
    case MBin(b) => new String(b, StandardCharsets.UTF_8)
    case other => throw new IllegalArgumentException(s"expected str, got $other")
  }

  /** The exact wire bytes of a str/bin field — nonce/salt from the C
    * reference are raw random bytes, so digests must see them undecoded.
    */
  private def asBytes(v: V): Array[Byte] = v match {
    case ms: MStr => ms.bytes
    case MBin(b) => b
    case other => throw new IllegalArgumentException(s"expected str, got $other")
  }

  /** Server side (in_forward): HELO out, PING in, PONG out. Returns true
    * when the client authenticated; on failure a PONG(false, reason) is
    * still sent (fw_prot.c:1357-1372 notifies then drops).
    */
  def serverHandshake(in: InputStream, out: OutputStream, sharedKey: String,
                      selfHostname: String,
                      users: Map[String, String] = Map.empty): Boolean = {
    val nonce = newNonce()
    val authSalt = if (users.nonEmpty) newNonce() else ""
    out.write(Msgpack.encode(MArr(Vector(MStr("HELO"), MMap(Vector(
      MStr("nonce") -> MStr(nonce),
      MStr("auth") -> MStr(authSalt),
      MStr("keepalive") -> MBool(true)))))))
    out.flush()

    def pong(ok: Boolean, reason: String, digest: String): Unit = {
      out.write(Msgpack.encode(MArr(Vector(MStr("PONG"), MBool(ok),
        MStr(reason), MStr(if (ok) selfHostname else ""),
        MStr(digest)))))
      out.flush()
    }

    readOne(in) match {
      case MArr(Vector(MStr("PING"), host, salt, digest, user, passDigest)) =>
        val hostBytes = asBytes(host)
        val saltBytes = asBytes(salt)
        val nonceBytes = nonce.getBytes(StandardCharsets.UTF_8)
        val ok = digestEq(asStr(digest),
          sharedKeyDigest(saltBytes, hostBytes, nonceBytes, sharedKey))
        val userOk = ok && (users.isEmpty || {
          val u = asStr(user)
          users.get(u).exists(pw =>
            digestEq(asStr(passDigest), passwordDigest(authSalt, u, pw)))
        })
        if (!ok) { pong(ok = false, "shared_key mismatch", ""); false }
        else if (!userOk) { pong(ok = false, "username/password mismatch", ""); false }
        else {
          pong(ok = true, "",
            sharedKeyDigest(saltBytes,
              selfHostname.getBytes(StandardCharsets.UTF_8), nonceBytes,
              sharedKey))
          true
        }
      case _ =>
        pong(ok = false, "invalid ping message", "")
        false
    }
  }

  /** Client side (out_forward `security` section): HELO in, PING out,
    * PONG in; verifies the server's own digest (mutual auth) like
    * fluent-bit's out_forward `secure_forward_pong` check.
    */
  def clientHandshake(in: InputStream, out: OutputStream, sharedKey: String,
                      selfHostname: String, username: String = "",
                      password: String = ""): Boolean = {
    val helo = readOne(in)
    val opts = helo match {
      case MArr(Vector(MStr("HELO"), m)) => m
      case other => throw new IllegalArgumentException(s"expected HELO, got $other")
    }
    // raw wire bytes: a real reference server sends raw random bytes
    // packed as msgpack str, which a UTF-8 String decode would corrupt
    val nonce = mapGet(opts, "nonce").map(asBytes).getOrElse(Array.emptyByteArray)
    val authSalt = mapGet(opts, "auth").map(asBytes).getOrElse(Array.emptyByteArray)
    val keySalt = newNonce()
    val passDigest =
      if (authSalt.nonEmpty) passwordDigest(authSalt, username, password)
      else ""
    out.write(Msgpack.encode(MArr(Vector(MStr("PING"), MStr(selfHostname),
      MStr(keySalt),
      MStr(sharedKeyDigest(keySalt.getBytes(StandardCharsets.UTF_8),
        selfHostname.getBytes(StandardCharsets.UTF_8), nonce, sharedKey)),
      MStr(username), MStr(passDigest)))))
    out.flush()

    readOne(in) match {
      case MArr(Vector(MStr("PONG"), MBool(ok), _, serverHost, serverDigest)) =>
        ok && digestEq(asStr(serverDigest),
          sharedKeyDigest(keySalt.getBytes(StandardCharsets.UTF_8),
            asBytes(serverHost), nonce, sharedKey))
      case _ => false
    }
  }
}
