// Byte-level BPE encoder core (SURVEY.md C-N4: the reference's tokenizer
// is HF `tokenizers` in Rust; this is the native C++ equivalent for this
// framework — Rust is unavailable in the build environment).
//
// Scope: the merge loop, which is the hot part of BPE. The Python wrapper
// (sesameai_tts_tpu/tokenizer/native_bpe.py) handles tokenizer.json
// parsing and regex pretokenization, then calls encode_pretoken() per
// pretoken over the raw UTF-8 bytes.
//
// Vocabulary model: byte-level BPE (GPT-2/llama3 family). Tokens are byte
// strings; merges are ranked pairs. We store:
//   * vocab: id -> byte string (loaded once via load_vocab)
//   * merge ranks: hash map from (left_id, right_id) -> (rank, merged_id)
//
// Exposed C ABI (ctypes):
//   bpe_new() -> handle
//   bpe_add_token(h, bytes, len, id)
//   bpe_add_merge(h, left_id, right_id, merged_id, rank)
//   bpe_finalize(h)
//   bpe_encode(h, bytes, len, out_ids, max_out) -> n_ids (or -1 on error)
//   bpe_free(h)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<uint32_t, uint32_t>& p) const {
        return (static_cast<size_t>(p.first) << 32) ^ p.second;
    }
};

struct BPE {
    // byte string -> id (for single-byte bootstrap lookup)
    std::unordered_map<std::string, uint32_t> token_ids;
    // (left, right) -> (rank, merged)
    std::unordered_map<std::pair<uint32_t, uint32_t>, std::pair<uint32_t, uint32_t>,
                       PairHash>
        merges;
    // single-byte token ids: byte value -> id (0xFFFFFFFF = absent)
    uint32_t byte_ids[256];
    bool finalized = false;
};

}  // namespace

extern "C" {

void* bpe_new() { return new BPE(); }

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

void bpe_add_token(void* h, const char* bytes, int len, uint32_t id) {
    auto* b = static_cast<BPE*>(h);
    b->token_ids.emplace(std::string(bytes, len), id);
}

void bpe_add_merge(void* h, uint32_t left, uint32_t right, uint32_t merged,
                   uint32_t rank) {
    auto* b = static_cast<BPE*>(h);
    b->merges.emplace(std::make_pair(left, right), std::make_pair(rank, merged));
}

int bpe_finalize(void* h) {
    auto* b = static_cast<BPE*>(h);
    for (int i = 0; i < 256; ++i) b->byte_ids[i] = 0xFFFFFFFFu;
    for (int i = 0; i < 256; ++i) {
        char c = static_cast<char>(i);
        auto it = b->token_ids.find(std::string(&c, 1));
        if (it != b->token_ids.end()) b->byte_ids[i] = it->second;
    }
    b->finalized = true;
    return 0;
}

// Greedy lowest-rank merging over the byte sequence of one pretoken.
// Returns the id count, -1 on error, -2 if out_ids is too small (caller
// should retry with a larger buffer).
//
// NOTE: deliberately NO whole-pretoken vocab lookup — byte-level BPE
// vocabs contain tokens the merge algorithm never produces (their merge
// is superseded by a lower-ranked competing pair), and the reference
// tokenizers emit the merged PIECES for such strings, not the direct id.
int bpe_encode(void* h, const char* bytes, int len, uint32_t* out_ids,
               int max_out) {
    auto* b = static_cast<BPE*>(h);
    if (!b->finalized || len <= 0) return -1;

    std::vector<uint32_t> ids;
    ids.reserve(len);
    for (int i = 0; i < len; ++i) {
        uint32_t id = b->byte_ids[static_cast<uint8_t>(bytes[i])];
        if (id == 0xFFFFFFFFu) return -1;  // byte not in vocab
        ids.push_back(id);
    }

    // iteratively merge the lowest-rank adjacent pair
    while (ids.size() >= 2) {
        uint32_t best_rank = 0xFFFFFFFFu;
        size_t best_pos = 0;
        uint32_t best_merged = 0;
        for (size_t i = 0; i + 1 < ids.size(); ++i) {
            auto it = b->merges.find(std::make_pair(ids[i], ids[i + 1]));
            if (it != b->merges.end() && it->second.first < best_rank) {
                best_rank = it->second.first;
                best_pos = i;
                best_merged = it->second.second;
            }
        }
        if (best_rank == 0xFFFFFFFFu) break;
        ids[best_pos] = best_merged;
        ids.erase(ids.begin() + best_pos + 1);
    }

    if (static_cast<int>(ids.size()) > max_out) return -2;
    std::memcpy(out_ids, ids.data(), ids.size() * sizeof(uint32_t));
    return static_cast<int>(ids.size());
}

}  // extern "C"
