// C++ test binary for the native runtime — the counterpart of the
// reference's test/bpe_test.cpp 8-test suite (SURVEY.md §4), driving
// our extern "C" API (runtime/csrc/api.cpp) without Python.
//
// Build+run via tests/test_native_cpp.py, or manually:
//   g++ -O2 -std=c++17 -o /tmp/native_test tests/csrc/native_test.cpp \
//       shredword_tpu/runtime/csrc/{corpus,faithful,encode,unigram,api}.cpp \
//       -I shredword_tpu/runtime/csrc -pthread && /tmp/native_test

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

extern "C" {
struct ShredConfigC {
  int64_t target_vocab_size;
  int32_t unk_id;
  double character_coverage;
  uint64_t min_pair_freq;
};
void* shred_corpus_from_bytes(const uint8_t*, int64_t, int, int);
void* shred_corpus_from_file(const char*, int, int);
int64_t shred_corpus_num_words(void*);
int64_t shred_corpus_total_occurrences(void*);
void shred_corpus_free(void*);
void* shred_trainer_create(const ShredConfigC*);
void shred_trainer_load(void*, void*);
int shred_trainer_train(void*, int);
int64_t shred_trainer_num_merges(void*);
void shred_trainer_get_merges(void*, int32_t*);
int shred_trainer_save(void*, const char*, const char*);
void shred_trainer_free(void*);
void* shred_encoder_create(const int32_t*, int64_t);
int64_t shred_encode_words(void*, const uint8_t*, const int64_t*, int64_t,
                           int, int32_t*, int64_t);
void shred_encoder_free(void*);
}

#define TEST_ASSERT(cond, msg)                                      \
  do {                                                              \
    if (!(cond)) {                                                  \
      printf("  FAIL: %s (line %d)\n", msg, __LINE__);              \
      return 1;                                                     \
    }                                                               \
  } while (0)

#define TEST_PASS(name)       \
  do {                        \
    printf("  PASS: %s\n", name); \
    return 0;                 \
  } while (0)

static const char* kCorpus =
    "the quick brown fox jumps over the lazy dog\n"
    "pack my box with five dozen liquor jugs\n"
    "the the the quick quick brown brown brown\n"
    "aaa aaa aaa bbb bbb ccc\n";

static std::string write_corpus() {
  std::string path = "/tmp/shred_native_test_corpus.txt";
  FILE* f = fopen(path.c_str(), "w");
  for (int i = 0; i < 10; i++) fputs(kCorpus, f);
  fclose(f);
  return path;
}

static ShredConfigC small_cfg() {
  ShredConfigC c;
  c.target_vocab_size = 300;
  c.unk_id = -1;
  c.character_coverage = 0.9999;
  c.min_pair_freq = 2;
  return c;
}

static int test_trainer_creation() {
  ShredConfigC cfg = small_cfg();
  void* t = shred_trainer_create(&cfg);
  TEST_ASSERT(t != nullptr, "trainer created");
  shred_trainer_free(t);
  TEST_PASS("trainer creation");
}

static int test_config_defaults() {
  // invalid coverage / zero min freq must fall back to reference
  // defaults (bpe.cpp:124-130) rather than crash
  ShredConfigC cfg = small_cfg();
  cfg.character_coverage = 1.5;
  cfg.min_pair_freq = 0;
  void* t = shred_trainer_create(&cfg);
  TEST_ASSERT(t != nullptr, "trainer with defaulted config");
  shred_trainer_free(t);
  TEST_PASS("config defaulting");
}

static int test_corpus_loading() {
  std::string path = write_corpus();
  void* c = shred_corpus_from_file(path.c_str(), 1, 1);
  TEST_ASSERT(c != nullptr, "corpus loads");
  TEST_ASSERT(shred_corpus_num_words(c) > 10, "unique words found");
  TEST_ASSERT(shred_corpus_total_occurrences(c) >
                  shred_corpus_num_words(c),
              "occurrences exceed unique words");
  shred_corpus_free(c);
  unlink(path.c_str());
  TEST_PASS("corpus loading");
}

static int test_single_merge() {
  std::string path = write_corpus();
  void* c = shred_corpus_from_file(path.c_str(), 1, 1);
  ShredConfigC cfg = small_cfg();
  void* t = shred_trainer_create(&cfg);
  shred_trainer_load(t, c);
  int n = shred_trainer_train(t, 1);
  TEST_ASSERT(n == 1, "exactly one merge performed");
  int32_t m[2];
  shred_trainer_get_merges(t, m);
  TEST_ASSERT(m[0] >= 0 && m[0] < 256 && m[1] >= 0 && m[1] < 256,
              "first merge joins two byte ids");
  shred_trainer_free(t);
  shred_corpus_free(c);
  unlink(path.c_str());
  TEST_PASS("single merge");
}

static int test_full_training() {
  std::string path = write_corpus();
  void* c = shred_corpus_from_file(path.c_str(), 1, 1);
  ShredConfigC cfg = small_cfg();
  void* t = shred_trainer_create(&cfg);
  shred_trainer_load(t, c);
  int n = shred_trainer_train(t, -1);
  TEST_ASSERT(n > 0, "training performs merges");
  TEST_ASSERT(n <= cfg.target_vocab_size - 256, "merge count bounded");
  shred_trainer_free(t);
  shred_corpus_free(c);
  unlink(path.c_str());
  TEST_PASS("full training");
}

static int test_model_saving() {
  std::string path = write_corpus();
  void* c = shred_corpus_from_file(path.c_str(), 1, 1);
  ShredConfigC cfg = small_cfg();
  void* t = shred_trainer_create(&cfg);
  shred_trainer_load(t, c);
  int n = shred_trainer_train(t, -1);
  const char* model = "/tmp/shred_native_test.model";
  const char* vocab = "/tmp/shred_native_test.vocab";
  TEST_ASSERT(shred_trainer_save(t, model, vocab) == 0, "save succeeds");
  struct stat st;
  TEST_ASSERT(stat(model, &st) == 0, "model file exists");
  TEST_ASSERT(st.st_size == 12 * (int64_t)n,
              "model = 12 bytes per merge (reference format)");
  FILE* vf = fopen(vocab, "rb");
  TEST_ASSERT(vf != nullptr, "vocab file exists");
  int lines = 0, ch;
  while ((ch = fgetc(vf)) != EOF)
    if (ch == '\n') lines++;
  fclose(vf);
  // one line per id 0..255+n, PLUS one: byte 0x0A's token string is a
  // literal newline (reference bpe_save writes raw bytes, the format
  // landmine documented in SURVEY.md §2.C)
  TEST_ASSERT(lines == 256 + n + 1, "vocab line per token id + 0x0A");
  shred_trainer_free(t);
  shred_corpus_free(c);
  unlink(path.c_str());
  unlink(model);
  unlink(vocab);
  TEST_PASS("model saving");
}

static int test_error_handling() {
  void* c = shred_corpus_from_file("/nonexistent/nope.txt", 1, 1);
  TEST_ASSERT(c == nullptr, "missing file reported, not crashed");
  TEST_PASS("error handling");
}

static int test_encoder_roundtrip() {
  // beyond the reference suite: the encoder the reference never had
  std::string path = write_corpus();
  void* c = shred_corpus_from_file(path.c_str(), 1, 1);
  ShredConfigC cfg = small_cfg();
  void* t = shred_trainer_create(&cfg);
  shred_trainer_load(t, c);
  int n = shred_trainer_train(t, -1);
  std::vector<int32_t> merges(2 * n);
  shred_trainer_get_merges(t, merges.data());
  void* e = shred_encoder_create(merges.data(), n);
  const char* word = "the";
  int64_t offs[2] = {0, 3};
  int32_t ids[16];
  int64_t k = shred_encode_words(e, (const uint8_t*)word, offs, 1, 1, ids,
                                 16);
  TEST_ASSERT(k >= 1 && k <= 3, "'the' encodes to 1..3 ids");
  TEST_ASSERT(k == 1, "'the' is a single token after training");
  shred_encoder_free(e);
  shred_trainer_free(t);
  shred_corpus_free(c);
  unlink(path.c_str());
  TEST_PASS("encoder round trip");
}

int main() {
  struct TestCase {
    const char* name;
    int (*fn)();
  } tests[] = {
      {"trainer creation", test_trainer_creation},
      {"config defaulting", test_config_defaults},
      {"corpus loading", test_corpus_loading},
      {"single merge", test_single_merge},
      {"full training", test_full_training},
      {"model saving", test_model_saving},
      {"error handling", test_error_handling},
      {"encoder round trip", test_encoder_roundtrip},
  };
  int failed = 0, total = 0;
  for (auto& tc : tests) {
    printf("[TEST] %s\n", tc.name);
    failed += tc.fn();
    total++;
  }
  printf("%d/%d tests passed\n", total - failed, total);
  return failed == 0 ? 0 : 1;
}
