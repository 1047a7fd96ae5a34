package graft.kafka

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/**
 * SCRAM-SHA-256 (RFC 5802 mechanics, RFC 7677 parameters) built on
 * JDK-only crypto — HmacSHA256, SHA-256 and PBKDF2WithHmacSHA256 —
 * the same from-spec discipline as the SigV4 signer (M11c). Pinned by
 * the RFC 7677 §3 test vector (user "user", password "pencil") in
 * `ScramSpec`.
 *
 * Both halves live here: the client exchange (used by
 * [[KafkaWireClient]] for SASL_SSL/SASL_PLAINTEXT clusters) and the
 * server-side verification (used by [[LoopbackBroker]]'s optional
 * SASL mode, so the proof exchange is tested against a full
 * scripted server, not a mirror of the client's own math).
 */
object Scram {

  def h(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }

  /** Hi(str, salt, i) — PBKDF2-HMAC-SHA256 (RFC 5802 §2.2). */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** RFC 5802 §5.1: ',' and '=' in names escape as =2C / =3D. */
  def saslName(s: String): String = s.replace("=", "=3D").replace(",", "=2C")

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key".getBytes(UTF_8))
  def storedKey(salted: Array[Byte]): Array[Byte] = h(clientKey(salted))
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key".getBytes(UTF_8))

  /** Ceiling on the server-demanded PBKDF2 iteration count a client
    * will honor (see ClientExchange.finalMessage). */
  val MaxIterations: Int = 10000000

  /** Parsed server-first-message: nonce, salt, iteration count. */
  final case class ServerFirst(nonce: String, salt: Array[Byte], iterations: Int)

  def parseServerFirst(msg: String): ServerFirst = {
    val kv = msg.split(",").map { f =>
      val i = f.indexOf('=')
      require(i > 0, s"malformed SCRAM field '$f'")
      f.substring(0, i) -> f.substring(i + 1)
    }.toMap
    require(!kv.contains("m"), "SCRAM mandatory extension not supported (m attribute)")
    ServerFirst(kv("r"), Base64.getDecoder.decode(kv("s")), kv("i").toInt)
  }

  /**
   * One client-side exchange. Construct with the user's credentials
   * and a nonce, feed the server messages through in order:
   * `firstMessage` → server-first → `finalMessage` → server-final →
   * `verifyServerFinal`. Nonce is injectable so the RFC test vector
   * pins the whole transcript.
   */
  final class ClientExchange(username: String, password: String, cnonce: String) {
    private val gs2Header = "n,,"
    private val clientFirstBare = s"n=${saslName(username)},r=$cnonce"
    private var serverFirstRaw: String = _
    private var saltedPassword: Array[Byte] = _
    private var authMessage: Array[Byte] = _

    def firstMessage: String = gs2Header + clientFirstBare

    /** client-final-message (with proof) for the given server-first. */
    def finalMessage(serverFirst: String): String = {
      serverFirstRaw = serverFirst
      val sf = parseServerFirst(serverFirst)
      require(sf.nonce.startsWith(cnonce),
        "server nonce does not extend the client nonce (possible MITM)")
      require(sf.iterations >= 1, s"non-positive iteration count ${sf.iterations}")
      // a hostile/misconfigured server demanding 2^31 PBKDF2 rounds
      // would stall the client for minutes per connection attempt
      // before any auth failure surfaced — cap well above the RFC 7677
      // 4096 minimum and any sane broker config
      require(sf.iterations <= MaxIterations,
        s"server demanded ${sf.iterations} PBKDF2 iterations " +
          s"(cap $MaxIterations; RFC 7677 minimum is 4096, brokers typically use 4096-16384) — " +
          "refusing a CPU-exhaustion handshake")
      saltedPassword = hi(password, sf.salt, sf.iterations)
      // c=biws is base64("n,,") — the channel-binding echo
      val withoutProof = s"c=biws,r=${sf.nonce}"
      authMessage = s"$clientFirstBare,$serverFirstRaw,$withoutProof".getBytes(UTF_8)
      val ck = clientKey(saltedPassword)
      val proof = xor(ck, hmac(h(ck), authMessage))
      s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}"
    }

    /** Validates the server's v= signature — the mutual-auth half;
      * a server that can't produce it never knew the password. */
    def verifyServerFinal(serverFinal: String): Unit = {
      require(serverFinal.startsWith("v="), s"malformed server-final '$serverFinal'")
      val expected = hmac(serverKey(saltedPassword), authMessage)
      val got = Base64.getDecoder.decode(serverFinal.substring(2))
      require(java.security.MessageDigest.isEqual(expected, got),
        "server signature mismatch — server does not know the password")
    }
  }

  /**
   * Server side: verifies a client exchange against stored SCRAM
   * credentials (salt, iterations, StoredKey, ServerKey — a real
   * server never holds the cleartext password; here they derive from
   * one at construction for the in-memory broker).
   */
  final class ServerExchange(username: String, password: String,
                             snonce: String,
                             salt: Array[Byte],
                             iterations: Int = 4096) {
    private val salted = hi(password, salt, iterations)
    private val stored = storedKey(salted)
    private val skey = serverKey(salted)
    private var clientFirstBare: String = _
    private var serverFirstMsg: String = _
    private var combinedNonce: String = _

    /** server-first-message for a client-first-message. */
    def serverFirst(clientFirst: String): String = {
      require(clientFirst.startsWith("n,,"),
        s"unsupported GS2 header in '$clientFirst' (channel binding not offered)")
      clientFirstBare = clientFirst.substring(3)
      // attributes parse by '=' position, not a fixed one-char-key
      // assumption — a standards-compliant client sending an optional
      // extension must get a CLEAN unsupported-extension error, not a
      // misparse cascading into a confusing "unknown user"
      val kv = clientFirstBare.split(",").map { f =>
        val i = f.indexOf('=')
        require(i > 0, s"malformed SCRAM attribute '$f'")
        f.substring(0, i) -> f.substring(i + 1)
      }.toMap
      require(!kv.contains("m"),
        "SCRAM mandatory extension not supported (m attribute in client-first-message)")
      // RFC 5802 §5.1: only an m= (mandatory) extension may be
      // rejected; unrecognized OPTIONAL attributes MUST be ignored —
      // a compliant client sending e.g. tokn=... still authenticates
      require(kv.contains("n") && kv.contains("r"),
        "client-first-message missing required n=/r= attributes")
      require(kv.get("n").contains(saslName(username)), "unknown user")
      combinedNonce = kv("r") + snonce
      serverFirstMsg = s"r=$combinedNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"
      serverFirstMsg
    }

    /** Verifies client-final; returns server-final (v=signature). */
    def serverFinal(clientFinal: String): String = {
      val kv = clientFinal.split(",").map { f =>
        val i = f.indexOf('=')
        require(i > 0, s"malformed SCRAM attribute '$f'")
        f.substring(0, i) -> f.substring(i + 1)
      }.toMap
      require(kv.get("c").contains("biws"), "channel-binding echo mismatch")
      require(kv.get("r").contains(combinedNonce), "nonce mismatch")
      val proofAt = clientFinal.lastIndexOf(",p=")
      require(proofAt > 0 && kv.contains("p"),
        "malformed client-final-message: missing proof attribute")
      val withoutProof = clientFinal.substring(0, proofAt)
      val authMessage = s"$clientFirstBare,$serverFirstMsg,$withoutProof".getBytes(UTF_8)
      val proof = Base64.getDecoder.decode(kv("p"))
      val recoveredClientKey = xor(proof, hmac(stored, authMessage))
      require(java.security.MessageDigest.isEqual(h(recoveredClientKey), stored),
        "SCRAM proof verification failed (wrong password)")
      s"v=${Base64.getEncoder.encodeToString(hmac(skey, authMessage))}"
    }
  }

  private val rng = new java.security.SecureRandom()

  /** Printable nonce (RFC 5802: printable chars excluding ','). */
  def newNonce(len: Int = 20): String = {
    val chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    val sb = new StringBuilder
    (0 until len).foreach(_ => sb.append(chars(rng.nextInt(chars.length))))
    sb.toString
  }
}
