"""Talk to a running `vtt serve` with any OpenAI client (or raw HTTP).

Start the server first:
    vtt serve /path/to/Qwen3-8B --port 8000
"""

import json
import urllib.request

BASE = "http://localhost:8000"


def post(path: str, payload: dict) -> dict:
    req = urllib.request.Request(
        BASE + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.load(r)


print(post("/v1/completions", {
    "prompt": "The three laws of robotics are",
    "max_tokens": 64, "temperature": 0.0,
})["choices"][0]["text"])

print(post("/v1/chat/completions", {
    "messages": [{"role": "user", "content": "One-line haiku about TPUs."}],
    "max_tokens": 48,
})["choices"][0]["message"]["content"])

# Structured output: force valid JSON matching a schema
print(post("/v1/chat/completions", {
    "messages": [{"role": "user", "content": "Give me a user."}],
    "max_tokens": 64,
    "guided_json": {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    },
})["choices"][0]["message"]["content"])

# Embeddings
vec = post("/v1/embeddings", {"input": "hello tpu", "dimensions": 64})
print(len(vec["data"][0]["embedding"]), "dims")
