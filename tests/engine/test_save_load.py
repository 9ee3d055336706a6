"""Native checkpoint save / fast resume / weight reload."""

import numpy as np

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def test_save_and_resume_identical_outputs(tiny_model_dir, tmp_path):
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48)
    params = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    prompt = [[11, 12, 13, 14]]
    ref = [o.outputs[0].token_ids for o in llm.generate(prompt, params)]

    ckpt = str(tmp_path / "ckpt")
    llm.llm_engine.save_state(ckpt)

    import os

    assert os.path.exists(os.path.join(ckpt,
                                       "vtt_native_state.safetensors"))
    # Resume from the native checkpoint (no HF-layout weights present).
    llm2 = LLM(model=ckpt, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               skip_tokenizer_init=True)
    out2 = [o.outputs[0].token_ids for o in llm2.generate(prompt, params)]
    assert out2 == ref


def test_reload_weights_changes_outputs(tiny_model_dir, tmp_path):
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48)
    params = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    prompt = [[21, 22, 23]]
    a = [o.outputs[0].token_ids for o in llm.generate(prompt, params)]

    # Save, perturb in-memory weights via a different-seed dummy reload,
    # then restore from the checkpoint.
    ckpt = str(tmp_path / "ckpt2")
    llm.llm_engine.save_state(ckpt)
    runner = llm.llm_engine.engine_core.executor.worker.model_runner
    w_orig = np.asarray(runner.params["embed_tokens"])
    runner.model_config.seed = 123
    runner.model_config.load_format = "dummy"
    llm.llm_engine.reload_weights()
    w_new = np.asarray(runner.params["embed_tokens"])
    assert not np.array_equal(w_orig, w_new)  # weights actually swapped
    llm.generate(prompt, params)  # engine still functional

    runner.model_config.load_format = "auto"
    llm.llm_engine.reload_weights(ckpt)
    w_back = np.asarray(runner.params["embed_tokens"])
    np.testing.assert_array_equal(w_back, w_orig)
    c = [o.outputs[0].token_ids for o in llm.generate(prompt, params)]
    assert c == a
