package ducklake;

import java.nio.charset.StandardCharsets;
import java.security.SecureRandom;
import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import javax.crypto.Mac;
import javax.crypto.spec.SecretKeySpec;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.DecryptionKeyRetriever;
import org.apache.parquet.crypto.DecryptionPropertiesFactory;
import org.apache.parquet.crypto.EncryptionPropertiesFactory;
import org.apache.parquet.crypto.FileDecryptionProperties;
import org.apache.parquet.crypto.FileEncryptionProperties;
import org.apache.parquet.crypto.ParquetCryptoRuntimeException;
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext;

/**
 * DuckLake-style parquet encryption for Spark writes/reads.
 *
 * The reference stores ONE random key per data file in the catalog
 * (ducklake_data_file.encryption_key; ducklake_insert.cpp:743-756) and
 * encrypts footer + all columns with it (uniform AES-GCM,
 * encrypted-footer mode). This factory pair mirrors that: the writer
 * takes the catalog key from `ducklake.encryption.write.key` (base64),
 * generates a fresh file DEK, and stamps PME-standard internal key
 * material (PKMT1 JSON with the DEK wrapped under the catalog key) into
 * the footer key metadata, so the SAME file decrypts through pyarrow's
 * CryptoFactory (ducklake_spark/crypto_pme.py implements the identical
 * HMAC-salt wrap for delete files) as well as through this reader. The
 * reader resolves catalog keys from `ducklake.encryption.file.keys`, a
 * comma list of `id:base64` entries the scan builds from the catalog;
 * it also accepts the legacy raw-key-id metadata this factory wrote
 * before the wrapped-DEK format (those files used the catalog key
 * directly, with plaintext footers).
 */
public class DuckLakeCrypto
    implements EncryptionPropertiesFactory, DecryptionPropertiesFactory {

  public static final String WRITE_KEY = "ducklake.encryption.write.key";
  public static final String WRITE_KEY_ID = "ducklake.encryption.write.key.id";
  public static final String FILE_KEYS = "ducklake.encryption.file.keys";
  public static final String PLAINTEXT_FOOTER = "ducklake.encryption.plaintext.footer";

  private static final SecureRandom RANDOM = new SecureRandom();

  /** HMAC-SHA256 keystream wrap, identical to crypto_pme._kms_factory:
   *  wrapped = salt16 || (DEK XOR HMAC(master, salt)[:len]). */
  static byte[] hmacStream(byte[] master, byte[] salt, int n) {
    try {
      Mac mac = Mac.getInstance("HmacSHA256");
      mac.init(new SecretKeySpec(master, "HmacSHA256"));
      byte[] digest = mac.doFinal(salt);
      byte[] out = new byte[n];
      System.arraycopy(digest, 0, out, 0, n);
      return out;
    } catch (Exception e) {
      throw new ParquetCryptoRuntimeException("HMAC failure", e);
    }
  }

  static String wrapKey(byte[] dek, byte[] master) {
    byte[] salt = new byte[16];
    RANDOM.nextBytes(salt);
    byte[] ks = hmacStream(master, salt, dek.length);
    byte[] out = new byte[16 + dek.length];
    System.arraycopy(salt, 0, out, 0, 16);
    for (int i = 0; i < dek.length; i++) {
      out[16 + i] = (byte) (dek[i] ^ ks[i]);
    }
    return Base64.getEncoder().encodeToString(out);
  }

  static byte[] unwrapKey(String wrapped, byte[] master) {
    byte[] w = Base64.getDecoder().decode(wrapped);
    byte[] salt = new byte[16];
    System.arraycopy(w, 0, salt, 0, 16);
    byte[] ks = hmacStream(master, salt, w.length - 16);
    byte[] dek = new byte[w.length - 16];
    for (int i = 0; i < dek.length; i++) {
      dek[i] = (byte) (w[16 + i] ^ ks[i]);
    }
    return dek;
  }

  @Override
  public FileEncryptionProperties getFileEncryptionProperties(
      Configuration conf, Path path, WriteContext ctx)
      throws ParquetCryptoRuntimeException {
    String b64 = conf.get(WRITE_KEY);
    if (b64 == null || b64.isEmpty()) {
      return null; // unencrypted write
    }
    byte[] master = Base64.getDecoder().decode(b64);
    String keyId = conf.get(WRITE_KEY_ID, "k");
    byte[] dek = new byte[16];
    RANDOM.nextBytes(dek);
    // PME internal key material (PKMT1), the exact shape pyarrow's
    // CryptoFactory writes and parses — interop verified both ways
    String material = "{\"keyMaterialType\":\"PKMT1\",\"internalStorage\":true,"
        + "\"isFooterKey\":true,"
        + "\"kmsInstanceID\":\"DEFAULT\",\"kmsInstanceURL\":\"DEFAULT\","
        + "\"masterKeyID\":\"" + keyId + "\","
        + "\"wrappedDEK\":\"" + wrapKey(dek, master) + "\","
        + "\"doubleWrapping\":false}";
    FileEncryptionProperties.Builder b = FileEncryptionProperties.builder(dek)
        .withFooterKeyMetadata(material.getBytes(StandardCharsets.UTF_8));
    if (conf.getBoolean(PLAINTEXT_FOOTER, false)) {
      // opt-out for debugging: column data encrypted, footer readable
      b = b.withPlaintextFooter();
    }
    return b.build(); // uniform: footer key (the DEK) encrypts every column
  }

  private static final Pattern MASTER_ID =
      Pattern.compile("\"masterKeyID\"\\s*:\\s*\"([^\"]+)\"");
  private static final Pattern WRAPPED_DEK =
      Pattern.compile("\"wrappedDEK\"\\s*:\\s*\"([^\"]+)\"");

  private static final class CatalogKeyRetriever implements DecryptionKeyRetriever {
    private final Map<String, byte[]> keys;

    CatalogKeyRetriever(Map<String, byte[]> keys) {
      this.keys = keys;
    }

    @Override
    public byte[] getKey(byte[] keyMetadata) throws ParquetCryptoRuntimeException {
      String meta = new String(keyMetadata, StandardCharsets.UTF_8);
      if (meta.startsWith("{")) {
        Matcher mid = MASTER_ID.matcher(meta);
        Matcher mdek = WRAPPED_DEK.matcher(meta);
        if (!mid.find() || !mdek.find()) {
          throw new ParquetCryptoRuntimeException(
              "unparseable PME key material: " + meta);
        }
        byte[] master = keys.get(mid.group(1));
        if (master == null) {
          throw new ParquetCryptoRuntimeException(
              "no catalog key for encrypted file key id " + mid.group(1));
        }
        return unwrapKey(mdek.group(1), master);
      }
      // legacy format: metadata is the raw catalog key id
      byte[] key = keys.get(meta);
      if (key == null) {
        throw new ParquetCryptoRuntimeException(
            "no catalog key for encrypted file key id " + meta);
      }
      return key;
    }
  }

  @Override
  public FileDecryptionProperties getFileDecryptionProperties(
      Configuration conf, Path path) throws ParquetCryptoRuntimeException {
    String list = conf.get(FILE_KEYS);
    if (list == null || list.isEmpty()) {
      return null;
    }
    Map<String, byte[]> keys = new HashMap<>();
    for (String entry : list.split(",")) {
      int i = entry.indexOf(':');
      if (i <= 0) continue;
      keys.put(entry.substring(0, i),
               Base64.getDecoder().decode(entry.substring(i + 1)));
    }
    return FileDecryptionProperties.builder()
        .withKeyRetriever(new CatalogKeyRetriever(keys))
        .withPlaintextFilesAllowed() // mixed lakes: adopted files stay plain
        .build();
  }
}
