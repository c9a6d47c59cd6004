"""Native (C++) components: PTB tokenizer, METEOR, Porter stemmer.

Replaces the reference's three Java tools (stanford-corenlp PTBTokenizer,
meteor-1.5.jar, spice-1.0.jar — SURVEY.md §2.4) with C++ behind the same Python
contracts.  See bindings.py for the build/ctypes layer."""
