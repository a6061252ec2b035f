package ducklake;

import java.util.Base64;
import java.util.HashMap;
import java.util.Map;

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
 * encrypts footer + all columns with it (uniform AES-GCM). This factory
 * pair mirrors that: the writer takes the key from
 * `ducklake.encryption.write.key` (base64) and stamps the file's key id
 * into the footer key metadata; the reader resolves keys from
 * `ducklake.encryption.file.keys`, a comma list of `id:base64` entries
 * the scan builds from the catalog.
 */
public class DuckLakeCrypto
    implements EncryptionPropertiesFactory, DecryptionPropertiesFactory {

  public static final String WRITE_KEY = "ducklake.encryption.write.key";
  public static final String WRITE_KEY_ID = "ducklake.encryption.write.key.id";
  public static final String FILE_KEYS = "ducklake.encryption.file.keys";
  public static final String PLAINTEXT_FOOTER = "ducklake.encryption.plaintext.footer";

  @Override
  public FileEncryptionProperties getFileEncryptionProperties(
      Configuration conf, Path path, WriteContext ctx)
      throws ParquetCryptoRuntimeException {
    String b64 = conf.get(WRITE_KEY);
    if (b64 == null || b64.isEmpty()) {
      return null; // unencrypted write
    }
    byte[] key = Base64.getDecoder().decode(b64);
    String keyId = conf.get(WRITE_KEY_ID, "k");
    FileEncryptionProperties.Builder b = FileEncryptionProperties.builder(key)
        .withFooterKeyMetadata(keyId.getBytes(java.nio.charset.StandardCharsets.UTF_8));
    if (conf.getBoolean(PLAINTEXT_FOOTER, true)) {
      // column data encrypted, footer readable: stats/row-count
      // harvesting and footer_size stay available to catalog tooling
      b = b.withPlaintextFooter();
    }
    return b.build(); // uniform: footer key encrypts every column
  }

  private static final class CatalogKeyRetriever implements DecryptionKeyRetriever {
    private final Map<String, byte[]> keys;

    CatalogKeyRetriever(Map<String, byte[]> keys) {
      this.keys = keys;
    }

    @Override
    public byte[] getKey(byte[] keyMetadata) throws ParquetCryptoRuntimeException {
      String id = new String(keyMetadata, java.nio.charset.StandardCharsets.UTF_8);
      byte[] key = keys.get(id);
      if (key == null) {
        throw new ParquetCryptoRuntimeException(
            "no catalog key for encrypted file key id " + id);
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
