"""Content-safety guardrails: the full reference family in JAX.

Parity: cosmos_predict1/auxiliary/guardrail/ —
  * GuardrailRunner chaining safety models + postprocessors
    (common/core.py:33-80)
  * Blocklist text filter (blocklist/blocklist.py): exact/partial word
    match against profanity + custom word lists, leetspeak folding,
    whitelist, and WordNet-morphy lemmatization (see _morphy below)
  * LlamaGuard3 text classifier — full JAX Llama-3.1-8B forward via
    models.ar_transformer (torch-oracle parity in tests/test_aux.py)
  * Aegis — Llama-2 wrapped with the PEFT LoRA adapter merged exactly
    into the base weights (parity vs peft merge_and_unload), O1..O13
    taxonomy verdict parsing
  * SigLIP video content filter (aux/siglip.py) + RetinaFace face blur
    (aux/retinaface.py), both JAX with torch-oracle parity.

All model-backed guardrails are checkpoint-gated: they run the real
network when weights are provided and raise with a clear message when
constructed without them (the GEN3C entry points disable guardrails by
default: gen3c_single_image.py:491-492).
"""

from __future__ import annotations

import os
import re
import string
from typing import Any, List, Optional, Tuple

import numpy as np

from gen3c_tpu.utils import log


class ContentSafetyGuardrail:
    def is_safe(self, x: Any) -> Tuple[bool, str]:
        raise NotImplementedError


class PostprocessingGuardrail:
    def postprocess(self, frames: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class GuardrailRunner:
    """common/core.py:33-80 parity."""

    def __init__(
        self,
        safety_models: Optional[List[ContentSafetyGuardrail]] = None,
        generic_block_msg: str = "",
        generic_safe_msg: str = "",
        postprocessors: Optional[List[PostprocessingGuardrail]] = None,
    ):
        self.safety_models = safety_models
        self.generic_block_msg = generic_block_msg
        self.generic_safe_msg = generic_safe_msg or "Prompt is safe"
        self.postprocessors = postprocessors

    def run_safety_check(self, x: Any) -> Tuple[bool, str]:
        if not self.safety_models:
            log.warning("No safety models found, returning safe")
            return True, self.generic_safe_msg
        for guardrail in self.safety_models:
            name = type(guardrail).__name__.upper()
            safe, message = guardrail.is_safe(x)
            if not safe:
                return False, self.generic_block_msg or f"{name}: {message}"
        return True, self.generic_safe_msg

    def postprocess(self, frames: np.ndarray) -> np.ndarray:
        if not self.postprocessors:
            return frames
        for pp in self.postprocessors:
            frames = pp.postprocess(frames)
        return frames

    # convenience interface used by Gen3cPipeline
    def run(self, x: Any):
        is_safe, msg = self.run_safety_check(x)
        if not is_safe:
            log.error(f"GUARDRAIL BLOCKED: {msg}")
            return None if not isinstance(x, str) else False
        if isinstance(x, str):
            return True
        return self.postprocess(x)


# better_profanity-equivalent leetspeak character variants: a censor
# word matches a prompt token when every character of the token is one
# of the word character's variants (VaryingString equality semantics)
_CHARS_MAPPING = {
    "a": ("a", "@", "*", "4"),
    "i": ("i", "*", "l", "1"),
    "o": ("o", "*", "0", "@"),
    "u": ("u", "*", "v"),
    "v": ("v", "*", "u"),
    "l": ("l", "1"),
    "e": ("e", "*", "3"),
    "s": ("s", "$", "5"),
    "t": ("t", "7"),
}
# characters that can be part of a word during censoring (everything
# else is a separator): letters, digits, and the leet variant chars
_WORD_CHARS = (
    set(string.ascii_letters) | set(string.digits) | {"@", "$", "*", "'"}
)


def _to_ascii(prompt: str) -> str:
    """blocklist/utils.py:44-46 parity."""
    return re.sub(r"[^\x00-\x7F]+", " ", prompt)


def _variant_match(word: str, token: str) -> bool:
    """True when `token` is a leetspeak variant of censor word `word`."""
    if len(word) != len(token):
        return False
    return all(
        t in _CHARS_MAPPING.get(w, (w,)) for w, t in zip(word, token)
    )


class _FuzzyCensor:
    """Word/phrase censor with leet variants (the better_profanity role
    in blocklist/blocklist.py:23,52,80: whole-word case-insensitive
    match, multi-word phrases, each hit replaced by censor_char*4)."""

    def __init__(self, words: List[str], whitelist: List[str]):
        wl = {w.strip().lower() for w in whitelist}
        self.phrases = [
            tuple(w.lower().split())
            for w in words
            if w.strip() and w.strip().lower() not in wl
        ]
        self.max_len = max((len(p) for p in self.phrases), default=1)

    def censor(self, text: str, censor_char: str = "*") -> str:
        # tokenize into (start, end, lowered word) runs of word chars
        tokens, i, n = [], 0, len(text)
        while i < n:
            if text[i] in _WORD_CHARS:
                j = i
                while j < n and text[j] in _WORD_CHARS:
                    j += 1
                tokens.append((i, j, text[i:j].lower()))
                i = j
            else:
                i += 1
        out, pos, t = [], 0, 0
        while t < len(tokens):
            matched_span = None
            for plen in range(min(self.max_len, len(tokens) - t), 0, -1):
                window = tokens[t:t + plen]
                for phrase in self.phrases:
                    if len(phrase) != plen:
                        continue
                    if all(
                        _variant_match(pw, tok[2])
                        for pw, tok in zip(phrase, window)
                    ):
                        matched_span = (window[0][0], window[-1][1], plen)
                        break
                if matched_span:
                    break
            if matched_span:
                start, end, plen = matched_span
                out.append(text[pos:start])
                out.append(censor_char * 4)
                pos = end
                t += plen
            else:
                t += 1
        out.append(text[pos:])
        return "".join(out)


# WordNet noun morphology (nltk MORPHOLOGICAL_SUBSTITUTIONS['n'] — the
# default pos the reference's lemmatizer.lemmatize(token) uses)
_NOUN_RULES = (
    ("s", ""), ("ses", "s"), ("ves", "f"), ("xes", "x"), ("zes", "z"),
    ("ches", "ch"), ("shes", "sh"), ("men", "man"), ("ies", "y"),
)
# common noun.exc irregulars (WordNet exception-list role)
_NOUN_EXCEPTIONS = {
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "lice": "louse",
    "oxen": "ox", "dice": "die", "knives": "knife", "wives": "wife",
    "lives": "life", "leaves": "leaf", "loaves": "loaf",
    "thieves": "thief", "selves": "self", "elves": "elf",
    "halves": "half", "calves": "calf", "shelves": "shelf",
    "scarves": "scarf", "hooves": "hoof", "wolves": "wolf",
    "corpora": "corpus", "analyses": "analysis", "crises": "crisis",
}


class _NounLemmatizer:
    """WordNet-morphy noun lemmatization against a provided lexicon
    (the nltk.WordNetLemmatizer role in blocklist/blocklist.py:42,173-175
    — the reference calls lemmatize(token) with the default pos='n').

    morphy validates rule outputs against the WordNet lexicon; without
    nltk data the lexicon here is the loaded word lists themselves —
    exactly the vocabulary whose inflected forms must fold back onto
    blocklist entries for the censor's second pass to behave like the
    reference's. Unknown words pass through unchanged, as in morphy.
    """

    def __init__(self, lexicon):
        self.lexicon = set(lexicon) | set(_NOUN_EXCEPTIONS.values())

    def lemmatize(self, form: str) -> str:
        word = form.lower()
        if word in _NOUN_EXCEPTIONS:
            return _NOUN_EXCEPTIONS[word]

        def apply_rules(forms):
            return [
                f[: -len(old)] + new
                for f in forms
                for old, new in _NOUN_RULES
                if f.endswith(old)
            ]

        forms = apply_rules([word])
        valid = [f for f in [word] + forms if f in self.lexicon]
        if valid:
            return min(valid, key=len)
        while forms:
            forms = apply_rules(forms)
            valid = [f for f in forms if f in self.lexicon]
            if valid:
                return min(valid, key=len)
        return form


class Blocklist(ContentSafetyGuardrail):
    """Word-blocklist text filter (blocklist/blocklist.py:32-192 parity):
    leet-variant fuzzy censoring with whitelist uncensor, a lemmatized
    second pass (WordNet noun morphy, lexicon = the word lists), and the
    exact-match list with SequenceMatcher partial matching. Word lists
    load from <checkpoint_dir>/blocklist/{custom,whitelist,exact_match}/
    (reference checkpoint layout); loose *.txt under blocklist/ are
    treated as custom words."""

    CENSOR = "*"

    def __init__(self, checkpoint_dir: Optional[str] = None,
                 extra_words: Optional[List[str]] = None,
                 whitelist_words: Optional[List[str]] = None,
                 exact_match_words: Optional[List[str]] = None,
                 guardrail_partial_match_min_chars: int = 6,
                 guardrail_partial_match_letter_count: float = 0.4):
        self.guardrail_partial_match_min_chars = (
            guardrail_partial_match_min_chars
        )
        self.guardrail_partial_match_letter_count = (
            guardrail_partial_match_letter_count
        )
        self.blocklist_words = [w.lower() for w in (extra_words or [])]
        self.whitelist_words = [w.lower() for w in (whitelist_words or [])]
        self.exact_match_words = [
            w.lower() for w in (exact_match_words or [])
        ]
        if checkpoint_dir:
            bl_dir = os.path.join(checkpoint_dir, "blocklist")
            if os.path.isdir(bl_dir):
                for root, _, files in os.walk(bl_dir):
                    sub = os.path.relpath(root, bl_dir).split(os.sep)[0]
                    target = {
                        "whitelist": self.whitelist_words,
                        "exact_match": self.exact_match_words,
                    }.get(sub, self.blocklist_words)
                    for f in sorted(files):
                        if f.endswith(".txt"):
                            with open(os.path.join(root, f)) as fh:
                                target.extend(
                                    line.strip().lower()
                                    for line in fh if line.strip()
                                )
        self._censor = _FuzzyCensor(self.blocklist_words,
                                    self.whitelist_words)
        lexicon = {
            part
            for w in (self.blocklist_words + self.whitelist_words
                      + self.exact_match_words)
            for part in w.split()
        }
        self.lemmatizer = _NounLemmatizer(lexicon)
        # back-compat alias (pre-round-3 API)
        self.words = set(self.blocklist_words)

    def uncensor_whitelist(self, input_prompt: str,
                           censored_prompt: str) -> str:
        """Restore whitelisted tokens (blocklist.py:57-66)."""
        input_words = input_prompt.split()
        censored_words = censored_prompt.split()
        whitelist = set(self.whitelist_words)
        for i, token in enumerate(input_words):
            if i < len(censored_words) and (
                token.strip(string.punctuation).lower() in whitelist
            ):
                censored_words[i] = token
        return " ".join(censored_words)

    def censor_prompt(self, input_prompt: str) -> Tuple[bool, str]:
        """Fuzzy censor + whitelist uncensor (blocklist.py:68-84)."""
        censored = self._censor.censor(input_prompt, self.CENSOR)
        censored = self.uncensor_whitelist(input_prompt, censored)
        if self.CENSOR in censored:
            return True, (
                "Prompt blocked by censorship: "
                f"Censored Prompt: {censored}"
            )
        return False, ""

    @staticmethod
    def check_partial_match(
        normalized_prompt: str, normalized_word: str,
        guardrail_partial_match_letter_count: float,
    ) -> Tuple[bool, str]:
        """SequenceMatcher partial match (blocklist.py:86-117)."""
        from difflib import SequenceMatcher

        prompt_words = normalized_prompt.split()
        word_length = len(normalized_word.split())
        max_ratio = (
            len(normalized_word) - float(
                guardrail_partial_match_letter_count
            )
        ) / float(len(normalized_word))
        for i in range(len(prompt_words) - word_length + 1):
            substring = " ".join(prompt_words[i:i + word_length])
            if SequenceMatcher(
                None, substring, normalized_word
            ).ratio() >= max_ratio:
                return True, (
                    "Prompt blocked by partial match blocklist: "
                    f"Prompt: {normalized_prompt}, "
                    f"Partial Match Word: {normalized_word}"
                )
        return False, ""

    def check_against_whole_word_blocklist(
        self, prompt: str, blocklist: List[str],
    ) -> Tuple[bool, str]:
        """Whole-word + partial exact-match pass (blocklist.py:119-158)."""
        normalized_prompt = re.sub(r"\s+", " ", prompt).strip().lower()
        for word in blocklist:
            normalized_word = re.sub(r"\s+", " ", word).strip().lower()
            if re.search(
                r"\b" + re.escape(normalized_word) + r"\b",
                normalized_prompt,
            ):
                return True, (
                    "Prompt blocked by exact match blocklist: "
                    f"Prompt: {prompt}, Exact Match Word: {word}"
                )
            if len(normalized_word) >= (
                self.guardrail_partial_match_min_chars
            ):
                match, message = self.check_partial_match(
                    normalized_prompt, normalized_word,
                    self.guardrail_partial_match_letter_count,
                )
                if match:
                    return True, message
        return False, ""

    def is_safe(self, prompt: str = "") -> Tuple[bool, str]:
        """Full reference check order (blocklist.py:160-192)."""
        if not prompt:
            return False, "Input is empty"
        prompt = _to_ascii(prompt)

        censored, message = self.censor_prompt(prompt)
        if censored:
            return False, message

        # lemmatized second pass catches inflected blocklist words
        # (token class keeps interior @/*/$ like nltk's treebank
        # tokenizer, so leet-variant words survive as single tokens)
        tokens = re.findall(r"[A-Za-z0-9'@*$]+|[^\sA-Za-z0-9'@*$]", prompt)
        lemmatized = " ".join(
            self.lemmatizer.lemmatize(tok) for tok in tokens
        )
        censored, message = self.censor_prompt(lemmatized)
        if censored:
            return False, message

        censored, message = self.check_against_whole_word_blocklist(
            prompt, self.exact_match_words
        )
        if censored:
            return False, message

        return True, "Input is safe"


class LlamaGuard3(ContentSafetyGuardrail):
    """LLM text safety classifier, TPU-native: the llama checkpoint runs
    through gen3c_tpu's own JAX AR transformer (llamaGuard3/ parity;
    conversion parity-tested vs transformers' torch LlamaForCausalLM in
    tests/test_vision_safety.py). Requires meta-llama/Llama-Guard-3-8B."""

    def __init__(self, checkpoint_dir: str, max_seq_len: int = 4096):
        path = os.path.join(checkpoint_dir, "meta-llama/Llama-Guard-3-8B")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"LlamaGuard3 checkpoint not found at {path}; run with "
                "blocklist-only guardrails or download the checkpoint"
            )
        import jax.numpy as jnp
        from transformers import AutoConfig, AutoTokenizer

        from gen3c_tpu.models.ar_transformer import ARConfig
        from gen3c_tpu.models.convert import convert_hf_llama

        self.tokenizer = AutoTokenizer.from_pretrained(path)
        hf = AutoConfig.from_pretrained(path)
        rs = getattr(hf, "rope_scaling", None)
        self.cfg = ARConfig(
            dim=hf.hidden_size,
            n_layers=hf.num_hidden_layers,
            n_heads=hf.num_attention_heads,
            n_kv_heads=hf.num_key_value_heads,
            vocab_size=hf.vocab_size,
            ffn_hidden_size=hf.intermediate_size,
            norm_eps=hf.rms_norm_eps,
            rope_theta=hf.rope_theta,
            max_seq_len=max_seq_len,
            use_qk_normalization=False,
            rope_scaling=(
                (rs["factor"], rs["low_freq_factor"],
                 rs["high_freq_factor"],
                 rs["original_max_position_embeddings"])
                if rs else None
            ),
            dtype=jnp.bfloat16,
        )
        # torch-CPU load once for conversion, then JAX owns the weights
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(path)
        from gen3c_tpu.models.quantize import maybe_quantized_convert

        # GEN3C_QUANTIZE_LLM=1: int8 weight-only — the 8B fits a 16 GB
        # chip at ~8.5 GB and decode reads half the weight bytes
        self.params = maybe_quantized_convert(
            lambda: convert_hf_llama(model.state_dict(), self.cfg)
        )
        del model


    def is_safe(self, prompt: str) -> Tuple[bool, str]:
        import jax
        import jax.numpy as jnp

        from gen3c_tpu.models.ar_transformer import generate_bucketed

        chat = [{"role": "user", "content": prompt}]
        ids = np.asarray(
            self.tokenizer.apply_chat_template(chat, return_tensors="np")
        )
        limit = self.cfg.max_seq_len - 16
        if ids.shape[1] > limit:
            # keep head + TAIL: the Llama-Guard template puts the safety
            # -assessment instruction at the END; right-truncating it
            # would make the model continue the user text and fail open
            head = limit // 2
            ids = np.concatenate(
                [ids[:, :head], ids[:, -(limit - head):]], axis=1
            )
        # bucketed left-padding: one compiled trace per 128-token bucket
        # instead of one per distinct prompt length
        out = generate_bucketed(
            self.params, self.cfg, jnp.asarray(ids, jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=16, temperature=0.0,
            pad_id=int(self.tokenizer.eos_token_id or 0),
        )
        text = self.tokenizer.decode(
            np.asarray(out)[0][out.shape[1] - 16:], skip_special_tokens=True
        )
        safe = "unsafe" not in text.lower()
        return safe, "" if safe else f"LlamaGuard3 verdict: {text.strip()}"


# Aegis 1.0/2.0 content-safety taxonomy (aegis/categories.py ids): the
# adapter answers "unsafe\nO<k>"; k indexes this table.
AEGIS_CATEGORIES = (
    ("violence", "violent content"),
    ("sexual", "sexually explicit content"),
    ("criminal_planning", "criminal planning or confessions"),
    ("weapons", "guns and illegal weapons"),
    ("substance_abuse", "controlled or regulated substances"),
    ("suicide_and_self_harm", "suicide or self-harm"),
    ("sexual_minor", "sexual content involving minors"),
    ("hate_identity_hate", "hate or identity-based hate"),
    ("pii", "personal identifying information or privacy violations"),
    ("harassment", "harassment"),
    ("threat", "threats"),
    ("profanity", "profanity"),
    ("needs_caution", "content that needs caution"),
)


def merge_peft_lora_into_llama(params, adapter_state, cfg,
                               alpha: float, r: int):
    """Merge a PEFT LoRA adapter into converted JAX llama params IN
    PLACE: W <- W + (alpha/r) * (B @ A)^T on each targeted projection.
    Exact at inference (the reference instead keeps the PeftModel
    wrapper live, aegis/aegis.py:48; merging avoids per-call adapter
    matmuls on TPU). adapter_state keys follow peft naming:
      base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
    """
    proj_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "w1", "down_proj": "w2", "up_proj": "w3",
    }
    import jax.numpy as jnp

    scale = float(alpha) / float(r)
    pat = re.compile(
        r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_A\.weight$"
    )
    merged = 0
    for key_a, A in adapter_state.items():
        m = pat.search(key_a)
        if not m:
            continue
        li, proj = int(m.group(1)), m.group(2)
        ours = proj_map.get(proj)
        if ours is None or li >= len(params["layers"]):
            continue
        key_b = key_a.replace("lora_A", "lora_B")
        B = adapter_state[key_b]

        def to_np(t):
            return (t.detach().float().cpu().numpy()
                    if hasattr(t, "detach") else np.asarray(t))

        delta = (to_np(B) @ to_np(A)).T * scale  # (in, out)
        w = params["layers"][li][ours]
        params["layers"][li][ours] = (
            w + jnp.asarray(delta, w.dtype)
        )
        merged += 1
    return merged


class Aegis(ContentSafetyGuardrail):
    """Aegis AI content-safety classifier: LlamaGuard-7b base + the
    nvidia Aegis LoRA adapter, TPU-native (aegis/aegis.py parity). The
    adapter is MERGED into the base weights at load and the merged model
    runs on the JAX AR stack; the moderation prompt carries the
    O1..O13 Aegis taxonomy and the verdict parser maps 'unsafe\\nO<k>'
    to a category block message (aegis/aegis.py:53-101)."""

    BASE = "meta-llama/LlamaGuard-7b"
    ADAPTER = "nvidia/Aegis-AI-Content-Safety-LlamaGuard-Defensive-1.0"

    def __init__(self, checkpoint_dir: str, max_seq_len: int = 4096):
        base_dir = os.path.join(checkpoint_dir, self.BASE)
        adapter_dir = os.path.join(checkpoint_dir, self.ADAPTER)
        for d in (base_dir, adapter_dir):
            if not os.path.isdir(d):
                raise FileNotFoundError(
                    f"Aegis checkpoint not found at {d}"
                )
        import json

        import jax.numpy as jnp
        from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

        from gen3c_tpu.models.ar_transformer import ARConfig
        from gen3c_tpu.models.convert import convert_hf_llama

        self.tokenizer = AutoTokenizer.from_pretrained(base_dir)
        hf = AutoConfig.from_pretrained(base_dir)
        self.cfg = ARConfig(
            dim=hf.hidden_size,
            n_layers=hf.num_hidden_layers,
            n_heads=hf.num_attention_heads,
            n_kv_heads=hf.num_key_value_heads,
            vocab_size=hf.vocab_size,
            ffn_hidden_size=hf.intermediate_size,
            norm_eps=hf.rms_norm_eps,
            rope_theta=hf.rope_theta,
            max_seq_len=max_seq_len,
            use_qk_normalization=False,
            dtype=jnp.bfloat16,
        )
        model = AutoModelForCausalLM.from_pretrained(base_dir)
        from gen3c_tpu.models.quantize import maybe_quantized_convert

        merged = {"n": 0}

        def _convert_and_merge():
            params = convert_hf_llama(model.state_dict(), self.cfg)
            adapter_state = load_peft_adapter_state(adapter_dir)
            with open(os.path.join(adapter_dir,
                                   "adapter_config.json")) as f:
                acfg = json.load(f)
            merged["n"] = merge_peft_lora_into_llama(
                params, adapter_state, self.cfg,
                alpha=acfg.get("lora_alpha", 32), r=acfg.get("r", 16),
            )
            return params

        self.params = maybe_quantized_convert(_convert_and_merge)
        del model
        if merged["n"] == 0:
            raise ValueError(f"no LoRA matrices merged from {adapter_dir}")
        log.info(
            f"Aegis: merged {merged['n']} LoRA matrices into the base model"
        )

    def get_moderation_prompt(self, user_prompt: str) -> str:
        cats = "\n".join(
            f"O{i + 1}: {name.replace('_', ' ').title()}."
            for i, (name, _) in enumerate(AEGIS_CATEGORIES)
        )
        return (
            "[INST] Task: Check if there is unsafe content in 'User' "
            "messages in conversations according our safety policy with "
            "the below categories.\n"
            "<BEGIN UNSAFE CONTENT CATEGORIES>\n"
            f"{cats}\n"
            "<END UNSAFE CONTENT CATEGORIES>\n"
            "<BEGIN CONVERSATION>\n"
            f"User: {user_prompt}\n\n"
            "<END CONVERSATION>\n\n"
            "Provide your safety assessment for User in the above "
            "conversation:\n"
            "- First line must read 'safe' or 'unsafe'.\n"
            "- If unsafe, a second line must include a comma-separated "
            "list of violated categories. [/INST]"
        )

    @staticmethod
    def block_message(moderation_output: str) -> str:
        """'unsafe\\nO3' -> category-specific block reason
        (aegis/aegis.py:72-86 parity)."""
        msg = "Prompt blocked by Aegis."
        lines = moderation_output.strip().split("\n")
        if len(lines) >= 2:
            m = re.search(r"O(\d+)", lines[1])
            if m:
                idx = int(m.group(1)) - 1
                if 0 <= idx < len(AEGIS_CATEGORIES):
                    name, reason = AEGIS_CATEGORIES[idx]
                    msg = f"{name}: this prompt is blocked due to {reason}."
        return msg

    def is_safe(self, prompt: str) -> Tuple[bool, str]:
        import jax
        import jax.numpy as jnp

        from gen3c_tpu.models.ar_transformer import generate_bucketed

        ids = np.asarray(
            self.tokenizer(
                [self.get_moderation_prompt(prompt)],
                add_special_tokens=False, return_tensors="np",
            )["input_ids"]
        )
        limit = self.cfg.max_seq_len - 100
        if ids.shape[1] > limit:
            head = limit // 2
            ids = np.concatenate(
                [ids[:, :head], ids[:, -(limit - head):]], axis=1
            )
        out = generate_bucketed(
            self.params, self.cfg, jnp.asarray(ids, jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=100, temperature=0.0,
            pad_id=int(self.tokenizer.eos_token_id or 0),
        )
        text = self.tokenizer.decode(
            np.asarray(out)[0][out.shape[1] - 100:],
            skip_special_tokens=True,
        )
        if "unsafe" in text.lower():
            return False, self.block_message(text)
        return True, ""


def load_peft_adapter_state(adapter_dir: str) -> dict:
    """Read a PEFT adapter's tensors (safetensors preferred, torch .bin
    fallback) without instantiating peft."""
    st_path = os.path.join(adapter_dir, "adapter_model.safetensors")
    if os.path.exists(st_path):
        from safetensors import safe_open

        out = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    bin_path = os.path.join(adapter_dir, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu",
                          weights_only=True)
    raise FileNotFoundError(f"no adapter weights under {adapter_dir}")


_SAFETY_CLASS_NAMES = {
    0: "Safe", 1: "Sexual_Content", 2: "Violence", 3: "Drugs",
    4: "Child_Abuse", 5: "Hate_and_Harassment", 6: "Self-Harm",
}


class VideoContentSafetyFilter(ContentSafetyGuardrail):
    """Frame-safety classifier, TPU-native: JAX SigLIP so400m vision
    encoder + 7-class MLP head (video_content_safety_filter/ parity,
    video_content_safety_filter.py:42-153; architecture in
    gen3c_tpu.aux.siglip with torch-oracle parity tests). Requires the
    Cosmos-Guardrail1 checkpoint (safety_filter.pt + cached SigLIP)."""

    def __init__(self, checkpoint_dir: str,
                 siglip_name: str = "google/siglip-so400m-patch14-384"):
        from gen3c_tpu.aux import siglip as S

        path = os.path.join(
            checkpoint_dir, "nvidia/Cosmos-Guardrail1",
            "video_content_safety_filter",
        )
        head_path = os.path.join(path, "safety_filter.pt")
        if not os.path.isfile(head_path):
            raise FileNotFoundError(
                f"Video content safety checkpoint not found at {head_path}"
            )
        import torch
        from transformers import SiglipModel

        # a local dir path also works as siglip_name (tests use a tiny
        # saved checkpoint)
        model = SiglipModel.from_pretrained(
            siglip_name, cache_dir=path, local_files_only=True
        )
        vc = model.config.vision_config
        self.cfg = S.SiglipVisionConfig(
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_hidden_layers=vc.num_hidden_layers,
            num_attention_heads=vc.num_attention_heads,
            image_size=vc.image_size,
            patch_size=vc.patch_size,
            layer_norm_eps=vc.layer_norm_eps,
        )
        self.encoder_params = S.convert_hf_siglip_vision(
            model.vision_model.state_dict(), self.cfg
        )
        ckpt = torch.load(head_path, map_location="cpu", weights_only=True)
        self.head_params = S.convert_safety_classifier(ckpt["model"])
        self._siglip = S

        import jax

        self._classify = jax.jit(self._classify_fn)

    def _classify_fn(self, pixels):
        import jax.numpy as jnp

        feats = self._siglip.siglip_image_features(
            self.encoder_params, self.cfg, pixels
        )
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        logits = self._siglip.safety_classifier_apply(self.head_params, feats)
        return jnp.argmax(logits, axis=-1)

    def is_safe(self, frames) -> Tuple[bool, str]:
        """Classify every frame; unsafe on the first non-'Safe' class
        (is_safe_frames parity, :116-143)."""
        import jax

        for i, frame in enumerate(frames):
            pixels = self._siglip.preprocess_frame(
                np.asarray(frame), self.cfg.image_size
            )[None]
            cls = int(jax.device_get(self._classify(pixels))[0])
            if cls != 0:
                name = _SAFETY_CLASS_NAMES.get(cls, "Unknown")
                return False, f"unsafe frames detected (frame {i}: {name})"
        return True, "safe frames detected"


class RetinaFaceFilter(PostprocessingGuardrail):
    """Face-blur postprocess, TPU-native: JAX RetinaFace ResNet-50
    detector + pixelation (face_blur_filter/ parity; architecture in
    gen3c_tpu.aux.retinaface). Requires the Resnet50_Final.pth
    checkpoint."""

    def __init__(self, checkpoint_dir: str,
                 confidence_threshold: float = 0.7):
        path = os.path.join(
            checkpoint_dir, "nvidia/Cosmos-Guardrail1", "face_blur_filter",
            "Resnet50_Final.pth",
        )
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"RetinaFace checkpoint not found at {path}"
            )
        import torch

        from gen3c_tpu.aux import retinaface as R

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k.split("module.", 1)[-1]: v for k, v in sd.items()}
        self.params = R.convert_retinaface(sd)
        self.confidence_threshold = confidence_threshold
        self._retinaface = R

    def postprocess(self, frames: np.ndarray) -> np.ndarray:
        return self._retinaface.blur_faces_in_frames(
            self.params, np.asarray(frames),
            confidence_threshold=self.confidence_threshold,
        )


def create_text_guardrail_runner(
    checkpoint_dir: Optional[str] = None,
) -> GuardrailRunner:
    """presets.py:31-36 parity; degrades to blocklist-only when no LLM
    classifier checkpoint is present. The Aegis LoRA-adapter variant
    (aegis/aegis.py) is preferred when its checkpoints exist
    (GEN3C_GUARDRAIL=aegis|llamaguard3 forces one)."""
    models: List[ContentSafetyGuardrail] = [Blocklist(checkpoint_dir)]
    prefer = os.environ.get("GEN3C_GUARDRAIL", "").lower()
    ckpt = checkpoint_dir or "checkpoints"
    tried = []
    order = (
        [Aegis, LlamaGuard3] if prefer != "llamaguard3"
        else [LlamaGuard3, Aegis]
    )
    if prefer == "aegis":
        order = [Aegis]
    for cls in order:
        try:
            models.append(cls(ckpt))
            break
        except (FileNotFoundError, OSError, ImportError, ValueError) as e:
            tried.append(f"{cls.__name__}: {e}")
    else:
        log.warning(
            f"LLM guardrail unavailable ({'; '.join(tried)}); "
            "blocklist-only"
        )
    return GuardrailRunner(safety_models=models)


def create_video_guardrail_runner(
    checkpoint_dir: Optional[str] = None,
) -> GuardrailRunner:
    """presets.py:38-42 parity; empty (pass-through) without checkpoints."""
    try:
        return GuardrailRunner(
            safety_models=[VideoContentSafetyFilter(checkpoint_dir or "")],
            postprocessors=[RetinaFaceFilter(checkpoint_dir or "")],
        )
    except (FileNotFoundError, OSError, NotImplementedError) as e:
        log.warning(f"Video guardrail unavailable ({e}); pass-through")
        return GuardrailRunner()
