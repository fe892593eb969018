package graft.sources

import java.io.FileInputStream
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, TrustManagerFactory}

/** TLS transport for the listening sources and push sinks — the
  * engine-side analogue of the reference's `tls on` plugin option
  * (`src/tls/flb_tls.c`; per-plugin keys `tls`, `tls.verify`,
  * `tls.crt_file`/`tls.key_file`, `tls.ca_file`).
  *
  * JVM-idiomatic key material: one PKCS12 keystore stands in for the
  * reference's PEM pair (`tls.keystore` + `tls.keystore_password` ≈
  * `tls.crt_file`+`tls.key_file` on the server side, `tls.ca_file` on
  * the client side — the same store can serve as both for self-signed
  * deployments). Config objects carry only paths/passwords so they
  * serialize to executors; contexts are built lazily where used.
  */
object Tls {

  /** Server-side config: `tls on` + keystore holding the private key. */
  final case class Server(keystorePath: String, password: String)
      extends Serializable

  /** Client-side config: truststore holding the peer's cert (absent ⇒
    * JVM default trust roots), plus `tls.verify`-style hostname check
    * toggle (the reference's `tls.verify false` skips peer verification;
    * here `verifyHostname false` skips only the hostname match — the
    * chain is still validated against the truststore).
    */
  final case class Client(truststorePath: Option[String] = None,
                          password: String = "",
                          verifyHostname: Boolean = true)
      extends Serializable

  private def loadKeyStore(path: String, password: String): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(path)
    try ks.load(in, password.toCharArray) finally in.close()
    ks
  }

  def serverContext(cfg: Server): SSLContext = {
    val ks = loadKeyStore(cfg.keystorePath, cfg.password)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, cfg.password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Trust manager over every certificate in the store — both trusted
    * entries and key entries' own chains, so a server keystore doubles
    * as the client truststore for self-signed setups.
    */
  def clientContext(cfg: Client): SSLContext = cfg.truststorePath match {
    case None => SSLContext.getDefault
    case Some(path) =>
      val src = loadKeyStore(path, cfg.password)
      val trust = KeyStore.getInstance("PKCS12")
      trust.load(null, null)
      val aliases = src.aliases()
      while (aliases.hasMoreElements) {
        val a = aliases.nextElement()
        val cert =
          if (src.isCertificateEntry(a)) src.getCertificate(a)
          else Option(src.getCertificateChain(a)).flatMap(_.headOption).orNull
        if (cert != null) trust.setCertificateEntry(s"trust-$a", cert)
      }
      val tmf = TrustManagerFactory.getInstance(
        TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(trust)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      ctx
  }

  /** An UNBOUND TLS server socket (callers bind, matching the plain
    * `new ServerSocket()` + bind flow of the listening sources).
    */
  def serverSocket(cfg: Server): SSLServerSocket =
    serverContext(cfg).getServerSocketFactory.createServerSocket()
      .asInstanceOf[SSLServerSocket]

  /** A connected TLS client socket (handshake on first I/O). */
  def clientSocket(cfg: Client, host: String, port: Int): SSLSocket = {
    val s = clientContext(cfg).getSocketFactory.createSocket(host, port)
      .asInstanceOf[SSLSocket]
    if (cfg.verifyHostname) {
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
    }
    s
  }

  /** Parse the per-source `tls`/`tls.keystore`/`tls.keystore_password`
    * option block (absent or `tls off` ⇒ None).
    */
  def serverFromOptions(get: String => Option[String]): Option[Server] =
    get("tls").map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case Some("on") | Some("true") =>
        val ks = get("tls.keystore").getOrElse(throw new IllegalArgumentException(
          "tls on requires option 'tls.keystore' (PKCS12)"))
        Some(Server(ks, get("tls.keystore_password").getOrElse("")))
      case _ => None
    }
}
