set -e
cd /root/repo
export GG_CPU=1
rm -rf /tmp/vmc /tmp/vmc-layers /tmp/vmc-db /tmp/vmc.gguf /tmp/vmc2.gguf
run() {
  python -c "
import jax, sys
jax.config.update('jax_platforms', 'cpu')
from gptq_gguf_tpu.__main__ import main
sys.exit(main(sys.argv[1:]))" "$@"
}
python - <<'PY'
import torch, json
from transformers import AutoConfig, AutoModelForCausalLM
cfg = AutoConfig.for_model(model_type="llama", vocab_size=256, hidden_size=256,
    intermediate_size=512, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, max_position_embeddings=512, torch_dtype="float32")
m = AutoModelForCausalLM.from_config(cfg).float()
m.save_pretrained("/tmp/vmc", safe_serialization=True)
json.dump({"model":{"type":"BPE","vocab":{f"<t{i}>":i for i in range(256)},"merges":[]},"added_tokens":[]}, open("/tmp/vmc/tokenizer.json","w"))
PY
run quantize --model_name_or_path /tmp/vmc \
  --calibration_data synthetic --calibration_tokens 256 \
  --calibration_sequence_length 64 --default_bit_width Q4_K \
  --save_dir /tmp/vmc-layers --verbose
run pack --model_dir /tmp/vmc --quant_dir /tmp/vmc-layers --outfile /tmp/vmc.gguf
run split --gguf-file /tmp/vmc.gguf --output-dir /tmp/vmc-db --gguf-layers
run stitch --split-dir /tmp/vmc-db --validate-only
run stitch --split-dir /tmp/vmc-db --output /tmp/vmc2.gguf
run ppl --model_name_or_path /tmp/vmc --datasets synthetic \
  --eval_tokens 256 --sequence_length 64
run serve --gguf-file /tmp/vmc.gguf --max-new-tokens 6 --prompt-tokens 5 6 7
echo "VERIFY_DRIVE_CPU_OK"
